"""operators/cdxcollapse.py — CDX collapse=digest / collapse=timestamp:N."""

import pytest

from crawler_spark.operators.cdxcollapse import collapse_digest, collapse_timestamp

ROWS = [
    # u1: A A B A — adjacent dup at ts2 collapses; the later A→B→A flip stays
    ("u1", "20260101010000", "https://a/1", "A"),
    ("u1", "20260101020000", "https://a/1", "A"),
    ("u1", "20260101030000", "https://a/1", "B"),
    ("u1", "20260102010000", "https://a/1", "A"),
    # u2: single capture — always kept
    ("u2", "20260101013000", "https://a/2", "C"),
    # u3: same-ts tie broken by url; both kept (digests differ)
    ("u3", "20260101010000", "https://a/3?x=1", "D"),
    ("u3", "20260101010000", "https://a/3?x=2", "E"),
]


@pytest.fixture()
def cdx(spark):
    return spark.createDataFrame(
        ROWS, "urlkey string, ts string, url string, digest string"
    )


def test_collapse_digest_adjacent_only(cdx):
    got = {(r["urlkey"], r["ts"], r["url"]) for r in collapse_digest(cdx).collect()}
    assert got == {
        ("u1", "20260101010000", "https://a/1"),
        ("u1", "20260101030000", "https://a/1"),
        ("u1", "20260102010000", "https://a/1"),  # A reappears after B: kept
        ("u2", "20260101013000", "https://a/2"),
        ("u3", "20260101010000", "https://a/3?x=1"),
        ("u3", "20260101010000", "https://a/3?x=2"),
    }


def test_collapse_digest_same_ts_dup_digest(spark):
    # duplicate (ts, digest) rows collapse to one, url ordering the walk
    df = spark.createDataFrame(
        [
            ("u", "20260101010000", "https://u/a", "X"),
            ("u", "20260101010000", "https://u/b", "X"),
        ],
        "urlkey string, ts string, url string, digest string",
    )
    kept = collapse_digest(df).collect()
    assert [(r["url"]) for r in kept] == ["https://u/a"]


def test_collapse_timestamp_day_granularity(cdx):
    got = {(r["urlkey"], r["ts"]) for r in collapse_timestamp(cdx, 8).collect()}
    assert got == {
        ("u1", "20260101010000"),  # first of day 1
        ("u1", "20260102010000"),  # first of day 2
        ("u2", "20260101013000"),
        ("u3", "20260101010000"),  # tie → smaller url, one row per day
    }
    # full 14-digit prefix = no collapsing at all (every ts distinct, ties by url)
    assert collapse_timestamp(cdx, 14).count() == 6


def test_collapse_timestamp_plan_has_no_window(cdx):
    plan = collapse_timestamp(cdx, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan or "HashAggregate" in plan
