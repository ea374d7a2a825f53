"""Structured-Streaming incremental ingest + classification.

The reference is strictly batch (each run is a finite pass over a path
list, /root/reference/src/warc_processor.py:382-455) — streaming is the
*extension* a continuously-arriving crawl feed needs, per SURVEY §1.3:
"Structured Streaming is optional sugar for incremental ingest".

Design:
- source: a parquet *directory* of pages treated as an unbounded table
  (``spark.readStream``); in production the same plan binds to Kafka/
  Kinesis of WARC pointers — only the source line changes.
- transform: EXACTLY the flagship plan's stages (same content-sniff, same
  Arrow decode+detector, same confidence gate) — the plan is declarative,
  so batch and streaming share it (the point of the DataFrame API).
- per-WARC dedupe is a window over (warc_source, url); windows aren't
  supported in streaming, so the streaming path uses ``foreachBatch`` and
  applies the batch dedupe within each micro-batch PLUS an idempotent
  anti-join against already-emitted results (exact, like url_seen).
  Cross-batch duplicate suppression therefore matches the batch flagship
  run (verified in tests/test_streaming.py).
- watermark/event-time: a late-data variant aggregates detections per
  (10-min warc_ts tumbling window × confidence) with a watermark — the
  shape a live crawl monitor needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans.flagship import classify_bulk
from crawler_spark.sources.corpus import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(src_dir)


def stream_classify(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_confidence: str = "medium",
    available_now: bool = True,
):
    """Incrementally classify newly-arrived page files into ``out_dir``.

    Returns the StreamingQuery. ``available_now=True`` drains everything
    currently in the source then stops (testable, resumable); False runs
    continuously. Exactly-once per (warc_source, url) across micro-batches:
    the foreachBatch sink dedupes within the batch (flagship policy) and
    anti-joins what earlier batches already wrote.
    """
    pages = read_pages_stream(spark, src_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        res = classify_bulk(batch_df, min_confidence=min_confidence)
        try:
            prev = spark.read.parquet(out_dir).select("warc_source", "url").distinct()
            res = res.join(prev, ["warc_source", "url"], "left_anti")
        except Exception:
            pass  # first batch: nothing emitted yet
        res.write.mode("append").parquet(out_dir)

    w = pages.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_confidence_counts(
    spark: SparkSession,
    src_dir: str,
    watermark: str = "30 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Event-time monitor: detections per (warc_ts window × confidence)
    with late-data tolerance — returns an unstarted streaming DataFrame
    the caller binds to a sink (memory sink in tests).

    The aggregation is on warc_ts (crawl event time), NOT arrival time;
    the watermark bounds state for the 100 TB/continuous case.
    """
    from crawler_spark.functions.detector import detect_udf
    from crawler_spark.plans.flagship import content_sniff_html

    pages = read_pages_stream(spark, src_dir)
    det = (
        pages.where(F.col("rec_type") == "response")
        .where(content_sniff_html(F.col("text")))
        .select("warc_ts", detect_udf(F.col("text")).alias("d"))
        .where(F.col("d.is_nextjs"))
        .select("warc_ts", F.col("d.confidence").alias("confidence"))
    )
    return (
        det.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "confidence")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "confidence",
            "n",
        )
    )
