"""Deterministic stratified sampling (operators/sampling.py).

Reference oracle: pure-Python md5-prefix bucket over the same ids.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import functions as F

from crawler_spark.operators.sampling import (
    sample_report,
    stratified_sample,
)


def _bucket(doc_id: int, salt: str) -> int:
    h = hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()
    return int(h[:15], 16) % 1000


def _rows(n=400):
    # strata sizes 200/120/80
    return [
        (i, "en" if i < 200 else ("de" if i < 320 else "fr"))
        for i in range(n)
    ]


def test_membership_matches_python_oracle(spark):
    rates, salt = {"en": 250, "de": 500}, "bal1"
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    got = {
        r["doc_id"]
        for r in stratified_sample(df, rates, salt=salt).select("doc_id").collect()
    }
    exp = {
        i
        for i, lang in _rows()
        if _bucket(i, salt) < rates.get(lang, 1000)
    }
    assert got == exp
    # default rate keeps every unlisted stratum row
    assert all(i in got for i, lang in _rows() if lang == "fr")


def test_determinism_and_salt_independence(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    a = {r["doc_id"] for r in stratified_sample(df, {"en": 300}).select("doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, {"en": 300}).select("doc_id").collect()}
    c = {r["doc_id"] for r in stratified_sample(df, {"en": 300}, salt="other").select("doc_id").collect()}
    assert a == b  # reproducible
    assert a != c  # salt actually changes the draw


def test_report_checksums(spark):
    rates = {"en": 250}
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    rep = {r["lang"]: r.asDict() for r in sample_report(df, rates).collect()}
    member = {
        lang: [i for i, l in _rows() if l == lang and _bucket(i, "bal1") < rates.get(l, 1000)]
        for lang in ("en", "de", "fr")
    }
    for lang, ids in member.items():
        row = rep[lang]
        assert row["n_sampled"] == len(ids)
        assert row["sum_ids"] == sum(ids)
        assert row["xor_ids"] == reduce(lambda x, y: x ^ y, ids, 0)
        assert row["achieved_pm"] == len(ids) * 1000 // row["n_total"]
    # en materially downsampled, fr untouched
    assert rep["en"]["n_sampled"] < rep["en"]["n_total"]
    assert rep["fr"]["n_sampled"] == rep["fr"]["n_total"]


def test_plan_is_scan_plus_filter_no_shuffle(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    plan = (
        stratified_sample(df, {"en": 300})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side filter
