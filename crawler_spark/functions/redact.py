"""PII redaction for the training-data pipeline tier.

Standard pre-training scrub (emails, NANP phone numbers, SSNs, IPv4) as
chained JVM ``regexp_replace`` — no UDF, whole-stage-codegen friendly.
Patterns are restricted to syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
``\\b`` word boundaries; no lookaround, no backreferences. Replacement
order matters (SSN's 3-2-4 shape before the 3-3-4 phone shape so a
phone never half-matches inside an already-redacted SSN, emails before
IPv4 so a host-with-digits local part is consumed whole).

Counts use ``regexp_extract_all`` length — same builtin both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement token) — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
]


def redact_pii(text: Column) -> Column:
    """The text with every PII pattern replaced by its token."""
    out = text
    for _, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_count(text: Column, name: str) -> Column:
    """Occurrence count of one named pattern (long)."""
    pat = {n: p for n, p, _ in PII_PATTERNS}[name]
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of redact_pii (global-flag regexp_replace chain)."""
    out = expr
    for _, pat, tok in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out


def sql_pii_count(expr: str, name: str) -> str:
    pat = {n: p for n, p, _ in PII_PATTERNS}[name]
    return f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"


def inject_pii_demo(text: Column, doc_id: Column) -> Column:
    """Deterministic PII appended per row — the synthetic corpus carries
    none, so the driver query plants one of each pattern (id-derived, so
    every row differs) to exercise the scrub end-to-end. Twin:
    sql_inject_pii_demo."""
    sid = doc_id.cast("string")
    p4 = F.lpad((doc_id % 10000).cast("string"), 4, "0")
    return F.concat(
        text,
        F.lit(" contact user"), sid, F.lit("@example.com"),
        F.lit(" call 555-867-"), p4,
        F.lit(" from 10.0."), (doc_id % 256).cast("string"), F.lit(".99"),
        F.lit(" ssn 123-45-"), p4,
    )


def sql_inject_pii_demo(text: str, doc_id: str) -> str:
    sid = f"CAST({doc_id} AS VARCHAR)"
    p4 = f"lpad(CAST({doc_id} % 10000 AS VARCHAR), 4, '0')"
    return (
        f"({text} || ' contact user' || {sid} || '@example.com'"
        f" || ' call 555-867-' || {p4}"
        f" || ' from 10.0.' || CAST({doc_id} % 256 AS VARCHAR) || '.99'"
        f" || ' ssn 123-45-' || {p4})"
    )
