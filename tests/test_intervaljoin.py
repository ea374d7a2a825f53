"""operators/intervaljoin.py — bucketed containment join."""

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark.operators.intervaljoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_containment_overlap_and_boundaries(spark):
    points = spark.createDataFrame(
        [
            ("p_in_both", _ts("2026-01-01 00:20:00")),
            ("p_start_incl", _ts("2026-01-01 00:00:00")),
            ("p_end_excl", _ts("2026-01-01 00:30:00")),
            ("p_nowhere", _ts("2026-01-01 05:00:00")),
        ],
        "url string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 00:00:00"), _ts("2026-01-01 00:30:00")),
            ("b", _ts("2026-01-01 00:15:00"), _ts("2026-01-01 01:00:00")),
        ],
        "campaign_id string, start timestamp, end timestamp",
    )
    got = sorted(
        (r["url"], r["campaign_id"])
        for r in interval_join(points, intervals, bin_s=600).collect()
    )
    assert got == [
        ("p_end_excl", "b"),  # end exclusive: 00:30 not in a, in b
        ("p_in_both", "a"),
        ("p_in_both", "b"),
        ("p_start_incl", "a"),
    ]


def test_matches_naive_join(spark):
    # property: bucketed result == naive theta join, any bin width
    points = spark.range(200).select(
        F.col("id").alias("pid"),
        (
            F.to_timestamp(F.lit("2026-01-01"))
            + F.make_interval(secs=F.col("id") * 37)
        ).alias("ts"),
    )
    intervals = spark.range(20).select(
        F.col("id").alias("iid"),
        (
            F.to_timestamp(F.lit("2026-01-01"))
            + F.make_interval(secs=F.col("id") * 300)
        ).alias("start"),
        (
            F.to_timestamp(F.lit("2026-01-01"))
            + F.make_interval(secs=F.col("id") * 300 + (F.col("id") % 5 + 1) * 200)
        ).alias("end"),
    )
    naive = set(
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")),
        ).collect()
    )
    for bin_s in (100, 250, 3600):
        got = set(
            (r["pid"], r["iid"])
            for r in interval_join(points, intervals, bin_s=bin_s).collect()
        )
        assert got == naive, bin_s


def test_plan_is_equi_join_not_nested_loop(spark):
    points = spark.range(10).select(
        F.col("id").alias("pid"),
        (
            F.to_timestamp(F.lit("2026-01-01")) + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )
    intervals = spark.range(3).select(
        F.col("id").alias("iid"),
        F.to_timestamp(F.lit("2026-01-01")).alias("start"),
        (F.to_timestamp(F.lit("2026-01-01")) + F.make_interval(hours=F.lit(1))).alias(
            "end"
        ),
    )
    plan = (
        interval_join(points, intervals)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)
