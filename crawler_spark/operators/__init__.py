"""Composed DataFrame operators: dedupe, Bloom URL-seen, politeness, robots."""
