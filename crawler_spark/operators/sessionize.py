"""Gap-based sessionization: per-key fetch sessions from an event log.

A polite crawler's fetch log per host is a sequence of timestamped
requests; connection-reuse windows ("sessions") are maximal runs with
inter-request gaps below a threshold. The same shape is the standard
log-sessionization primitive (batch twin of the streaming session
windows in streaming/ingest.py — SURVEY §2.9 exceeds-reference row).

Determinism contract: timestamps are compared as integer epoch
microseconds (the parquet precision), the order-by is the total order
(ts, event_id), and all derived columns are integer arithmetic — no
floats anywhere.

Scale shape: one shuffle on the session key; both windows (lag and the
running session counter) share the same (key, ts) sort so they compile
into a single exchange + sort; the per-session rollup is a partial-agg
group-by on (key, session_idx) — same key prefix, no second shuffle of
the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, epoch-microseconds


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """(key, session_idx, n_events, start_us, end_us, duration_us) —
    0-based session index per key, split where the gap to the previous
    event exceeds ``gap_us``."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ; the session pins UTC
    # (crawler_spark.session), so the cast is the identity and matches
    # DuckDB's epoch_us on the same naive value
    e = events.select(
        key, "event_id", "ts", F.unix_micros(F.col("ts").cast("timestamp")).alias("_us")
    ).withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = e.withColumn("session_idx", F.sum("_new").over(run).cast("long"))
    return e.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    )
