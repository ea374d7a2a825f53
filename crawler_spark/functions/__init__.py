"""Vectorized pandas/Arrow UDFs + built-in expression builders."""
