"""PII redaction (functions/redact.py).

Reference oracle: Python ``re`` over the same strings (Java regex, RE2,
and Python re agree on this restricted pattern subset — character
classes, bounded repetition, \\b).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawler_spark.functions.redact import (
    PII_PATTERNS,
    inject_pii_demo,
    pii_count,
    redact_pii,
)

SAMPLES = [
    (1, "reach me at jane.doe+spam@corp-mail.example.org thanks"),
    (2, "server 192.168.001.255 and also 8.8.8.8 replied"),
    (3, "call 555-867-5309 or 800.555.0199 now"),
    (4, "ssn 123-45-6789 but order id 1234-56-789 stays"),
    (5, "phone 555-867-5309 vs ssn 123-45-6789 in one row"),
    (6, "no pii here at all"),
    # email whose local part looks numeric; ip glued to punctuation
    (7, "55@a.bc end (10.0.0.1)"),
]


def _py_redact(t: str) -> str:
    for _, pat, tok in PII_PATTERNS:
        t = re.sub(pat, tok, t)
    return t


def test_redact_matches_python_re(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    got = {
        r["doc_id"]: r["out"]
        for r in df.select("doc_id", redact_pii(F.col("text")).alias("out")).collect()
    }
    for i, t in SAMPLES:
        assert got[i] == _py_redact(t), (i, got[i])
    # spot semantics: SSN redacted, similar-but-not-SSN left alone
    assert got[4] == "ssn <SSN> but order id 1234-56-789 stays"
    assert got[6] == "no pii here at all"


def test_counts_match_python_re(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    sel = [F.col("doc_id")] + [
        pii_count(F.col("text"), name).alias(name) for name, _, _ in PII_PATTERNS
    ]
    got = {r["doc_id"]: r.asDict() for r in df.select(*sel).collect()}
    for i, t in SAMPLES:
        for name, pat, _ in PII_PATTERNS:
            assert got[i][name] == len(re.findall(pat, t)), (i, name)


def test_inject_then_scrub_roundtrip(spark):
    df = spark.createDataFrame(
        [(257, "base words"), (3, "more base")], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        redact_pii(inject_pii_demo(F.col("text"), F.col("doc_id"))).alias("s"),
    ).collect()
    for r in out:
        s = r["s"]
        assert "<EMAIL>" in s and "<PHONE>" in s and "<SSN>" in s and "<IP>" in s
        assert "@" not in s and "555-867" not in s
