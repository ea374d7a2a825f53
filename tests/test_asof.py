"""operators/asof.py — as-of join + CDX closest-timestamp selection."""

import datetime as dt

import pytest

from crawler_spark.operators.asof import asof_join, cdx_closest


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def store(spark):
    caps = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 01:00:00"), "d1"),
            ("u1", _ts("2026-01-01 02:00:00"), "d2"),
            ("u2", _ts("2026-01-01 01:00:00"), "e1"),
        ],
        "url string, ts timestamp, digest string",
    )
    return caps


def test_asof_before_between_exact_after(spark, store):
    probes = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 00:30:00")),  # before first -> NULL
            ("u1", _ts("2026-01-01 01:30:00")),  # between -> d1
            ("u1", _ts("2026-01-01 02:00:00")),  # exact ts -> inclusive, d2
            ("u1", _ts("2026-01-01 03:00:00")),  # after last -> d2
            ("u3", _ts("2026-01-01 01:00:00")),  # unseen key -> NULL
        ],
        "url string, t timestamp",
    )
    got = {
        (r["url"], r["t"].isoformat()): r["digest"]
        for r in asof_join(probes, store).collect()
    }
    assert got == {
        ("u1", "2026-01-01T00:30:00"): None,
        ("u1", "2026-01-01T01:30:00"): "d1",
        ("u1", "2026-01-01T02:00:00"): "d2",
        ("u1", "2026-01-01T03:00:00"): "d2",
        ("u3", "2026-01-01T01:00:00"): None,
    }


def test_asof_duplicate_capture_ts_deterministic(spark):
    # two captures at the SAME (url, ts): the payload-struct ordering
    # makes last() a total order — the larger payload wins, always
    caps = spark.createDataFrame(
        [("u", _ts("2026-01-01 01:00:00"), "a"), ("u", _ts("2026-01-01 01:00:00"), "b")],
        "url string, ts timestamp, digest string",
    )
    probes = spark.createDataFrame(
        [("u", _ts("2026-01-01 01:30:00"))], "url string, t timestamp"
    )
    for _ in range(3):
        rows = asof_join(probes, caps).collect()
        assert [r["digest"] for r in rows] == ["b"]


def test_asof_plan_one_shuffle_no_nested_loop(spark, store):
    probes = spark.createDataFrame(
        [("u1", _ts("2026-01-01 01:30:00"))], "url string, t timestamp"
    )
    plan = (
        asof_join(probes, store)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_cdx_closest_picks_min_distance_and_tie_earlier(spark):
    cdx = spark.createDataFrame(
        [
            ("k1", "20260101010000", "u1", "a"),  # dist 1800
            ("k1", "20260101020000", "u1", "b"),  # dist 4200 (in ts-number space)
            ("k2", "20260101010000", "u2", "c"),  # tie with next on |dist|
            ("k2", "20260101020000", "u2", "d"),
        ],
        "urlkey string, ts string, url string, digest string",
    )
    got = {
        r["urlkey"]: r["digest"]
        for r in cdx_closest(cdx, "20260101013000").collect()
    }
    assert got["k1"] == "a"
    # 14-digit strings compared as integers: |10000-13000| = 3000,
    # |20000-13000| = 7000 -> k2 also picks the earlier one; a true tie
    # (equidistant) falls back to the earlier ts by the ordering struct
    assert got["k2"] == "c"


def test_cdx_closest_true_tie_goes_earlier(spark):
    cdx = spark.createDataFrame(
        [("k", "20260101010000", "u", "early"), ("k", "20260101020000", "u", "late")],
        "urlkey string, ts string, url string, digest string",
    )
    got = cdx_closest(cdx, "20260101013000").collect()
    # numeric midpoint 20260101013000 is equidistant from both
    assert got[0]["digest"] == "early"


def test_cdx_closest_plan_partial_agg_no_window(spark):
    cdx = spark.createDataFrame(
        [("k", "20260101010000", "u", "x")],
        "urlkey string, ts string, url string, digest string",
    )
    plan = (
        cdx_closest(cdx, "20260101013000")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # partial (map-side) aggregate before the exchange
    assert "partial_min_by" in plan or "partial" in plan.lower()
