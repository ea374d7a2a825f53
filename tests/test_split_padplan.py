"""Leak-free grouped splits and the padding-bucket plan, pinned against
pure-Python re-derivations."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import TOKEN_REGEX
from crawler_spark.operators.packing import (
    PAD_MAX_BUCKET,
    PAD_MIN_BUCKET,
    pad_plan,
)
from crawler_spark.operators.sampling import (
    SPLIT_RATES_PM,
    SPLIT_SALT,
    grouped_split,
    split_report,
)


def _py_split(group: str) -> str:
    b = int(hashlib.md5(f"{group}|{SPLIT_SALT}".encode()).hexdigest()[:15], 16) % 1000
    hi = 0
    for name, pm in SPLIT_RATES_PM[:-1]:
        hi += pm
        if b < hi:
            return name
    return SPLIT_RATES_PM[-1][0]


@pytest.mark.spark
def test_grouped_split_is_group_granular_and_matches_hash(spark):
    rows = [(i, f"g{i % 23}", 10 + i) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "host", "n_chars"])
    out = grouped_split(df, "host").select("host", "split").collect()
    per_group: dict = {}
    for r in out:
        per_group.setdefault(r["host"], set()).add(r["split"])
    # leak-free: one split per group, and it is the hash-derived one
    for g, splits in per_group.items():
        assert splits == {_py_split(g)}


@pytest.mark.spark
def test_split_report_counts(spark):
    rows = [(i, f"g{i % 23}", 10 + i) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "host", "n_chars"])
    rep = {r["split"]: r for r in split_report(df, "host").collect()}
    want_groups: dict = {}
    want_docs: dict = {}
    for i in range(200):
        s = _py_split(f"g{i % 23}")
        want_docs[s] = want_docs.get(s, 0) + 1
        want_groups.setdefault(s, set()).add(f"g{i % 23}")
    assert {k: v["n_docs"] for k, v in rep.items()} == want_docs
    assert {k: v["n_groups"] for k, v in rep.items()} == {
        k: len(v) for k, v in want_groups.items()
    }
    assert sum(v["n_docs"] for v in rep.values()) == 200
    for v in rep.values():
        assert v["achieved_pm"] == v["n_docs"] * 1000 // 200


def _py_bucket(n_tokens: int) -> int:
    u = min(n_tokens, PAD_MAX_BUCKET)
    if u <= 1:
        return PAD_MIN_BUCKET
    p = 1
    while p < u:
        p <<= 1
    return max(PAD_MIN_BUCKET, p)


@pytest.mark.spark
def test_pad_plan_matches_python_reference(spark):
    texts = [
        "",  # empty → min bucket
        "a",  # 1 token → min bucket
        "word " * 10,  # 10 → 16
        "word " * 17,  # 17 → 32
        "tok " * 64,  # exactly 64 → 64 (power of two stays put)
        "tok " * 65,  # 65 → 128
        "x " * (PAD_MAX_BUCKET + 100),  # truncated to the cap
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        r["bucket_len"]: (r["n_docs"], r["actual_tokens"], r["padded_tokens"], r["waste_pm"])
        for r in pad_plan(df).collect()
    }
    agg: dict = {}
    for t in texts:
        n = len(re.findall(TOKEN_REGEX, t))
        u = min(n, PAD_MAX_BUCKET)
        b = _py_bucket(n)
        d, a = agg.get(b, (0, 0))
        agg[b] = (d + 1, a + u)
    want = {
        b: (d, a, d * b, (d * b - a) * 1000 // (d * b))
        for b, (d, a) in agg.items()
    }
    assert got == want
    assert 64 in got  # the exact power-of-two case
