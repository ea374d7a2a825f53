"""Bucketed interval join: match timestamped events to (possibly
overlapping) time intervals without a nested-loop plan.

Crawl use: attribute every fetch to the crawl campaign / rate-limit
window / incident interval in force at that instant. Intervals overlap
(a host can be in two campaigns), so this is NOT the as-of join
(operators/asof.py — latest single predecessor); it is containment:
every (event, interval) pair with ``start <= ts < end``.

The naive formulation ``events JOIN intervals ON ts BETWEEN start AND
end`` has no equi-key, so Spark plans it as BroadcastNestedLoopJoin —
O(events × intervals) compared rows, a scale-killer the moment the
interval side outgrows a broadcast. The standard fix (same trick as
the geospatial grid join): quantize time into fixed bins, explode each
interval into the bins it touches, join on bin equality, then apply
the exact containment predicate. Each event carries exactly ONE bin,
so a (event, interval) pair can only meet in one bin — no duplicate
elimination pass.

Cost model: the interval side inflates by ceil(length / bin) rows —
pick ``bin_s`` near the median interval length so the inflation is a
small constant; a pathological months-long interval is better
broadcast separately (split long tail from short head by length) than
shrunk-bin-exploded. The join itself is a plain equi-join: map-side
pruned, AQE-skew-splittable, shuffle on the bin key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTERVAL_BIN_S = 900  # 15 min — the synth campaigns are 15-105 min long


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_s: int = INTERVAL_BIN_S,
) -> DataFrame:
    """Inner containment join: all columns of both inputs for every pair
    with ``start <= ts < end`` (half-open). Equi-join on a time bin;
    intervals explode into ceil(length/bin) rows, points stay 1:1."""
    bin_us = bin_s * 1_000_000
    # integer div, not float division: epoch-microseconds are ~2^50 and
    # the bin must be exact
    p = points.withColumn("_bin", F.expr(f"unix_micros({ts}) div {bin_us}"))
    # degenerate/inverted intervals (end <= start) can never contain a
    # point, but sequence() would still explode them (descending!) into
    # wasted join rows — drop them before the explode
    intervals = intervals.where(F.col(end) > F.col(start))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start}) div {bin_us}"),
                # end is exclusive: the bin of the last contained instant
                F.expr(f"(unix_micros({end}) - 1) div {bin_us}"),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_bin")
    )


def synth_campaigns(docs: DataFrame) -> DataFrame:
    """(campaign_id, start, end): 25 overlapping windows — start staggers
    by 10 min, length cycles 15..105 min, so consecutive campaigns
    overlap and some instants fall in none."""
    g = F.col("g")
    base = F.to_timestamp(F.lit("2026-01-01"))
    return (
        docs.select((F.col("doc_id") % 25).alias("g"))
        .distinct()
        .select(
            F.concat(F.lit("camp"), g.cast("string")).alias("campaign_id"),
            (base + F.make_interval(secs=g * 600)).alias("start"),
            (base + F.make_interval(secs=g * 600 + (g % 7 + 1) * 900)).alias(
                "end"
            ),
        )
    )


def synth_fetches(docs: DataFrame) -> DataFrame:
    """(url, ts): one fetch per doc, 7 s apart from the epoch."""
    return docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2026-01-01"))
            + F.make_interval(secs=F.col("doc_id") * 7)
        ).alias("ts"),
    )
