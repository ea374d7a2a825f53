"""Sources: deterministic synthetic corpus generator + snapshot table store."""
