"""Revisit marking + sitemap staleness: digest windows, date compares."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.revisit import (
    mark_revisits,
    revisit_savings,
    sitemap_staleness,
    synth_revisit_captures,
)

T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _ts(h):
    return T0 + datetime.timedelta(hours=h)


@pytest.mark.spark
def test_mark_revisits_semantics(spark):
    caps = spark.createDataFrame(
        [
            ("u1", _ts(0), "d1", 100),
            ("u1", _ts(1), "d2", 100),  # changed: not a revisit
            ("u1", _ts(2), "d1", 100),  # back to d1: revisit of capture 0
            ("u2", _ts(0), "d1", 50),   # same digest, OTHER url: original
        ],
        "url string, ts timestamp, digest string, n_bytes long",
    )
    got = {(r["url"], r["ts"]): r["is_revisit"] for r in mark_revisits(caps).collect()}
    assert got == {
        ("u1", _ts(0)): False,
        ("u1", _ts(1)): False,
        ("u1", _ts(2)): True,
        ("u2", _ts(0)): False,
    }


@pytest.mark.spark
def test_savings_ledger_on_synth(spark):
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body-"), F.col("id").cast("string")).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    out = {r["host"]: r for r in revisit_savings(synth_revisit_captures(docs)).collect()}
    # per host: 20 docs x 3 captures; src0 holds exactly the even
    # doc_ids, each planting one revisit (k=2 repeats k=0's digest)
    assert out["src0.example.com"]["n_captures"] == 60
    assert out["src1.example.com"]["n_captures"] == 60
    assert out["src0.example.com"]["n_revisits"] == 20
    assert out["src1.example.com"]["n_revisits"] == 0  # odd ids never repeat
    r0 = out["src0.example.com"]
    assert r0["bytes_stored"] + r0["bytes_saved"] == sum(
        len(f"body-{i}") * 3 for i in range(0, 40, 2)
    )


@pytest.mark.spark
def test_sitemap_staleness_buckets(spark):
    sm = spark.createDataFrame(
        [
            ("h", "u1", "2026-03-01"),  # lastmod after capture: stale
            ("h", "u2", "2026-01-01"),  # same day as capture: fresh
            ("h", "u3", None),          # no lastmod: unknown
            ("h", "u4", "2026-02-01"),  # never captured
        ],
        "host string, loc string, lastmod string",
    )
    caps = spark.createDataFrame(
        [("u1", _ts(5), "d", 1), ("u2", _ts(6), "d", 1), ("u3", _ts(7), "d", 1)],
        "url string, ts timestamp, digest string, n_bytes long",
    )
    r = sitemap_staleness(sm, caps).collect()[0]
    assert (r["n_listed"], r["n_uncaptured"], r["n_stale"], r["n_unknown"]) == (4, 1, 1, 1)
