"""Structured-Streaming ingest: incremental arrival matches the batch
flagship run; event-time windowed counts with watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.flagship import classify_bulk
from crawler_spark.sources.corpus import generate_pages
from crawler_spark.streaming.ingest import stream_classify, stream_confidence_counts

N = 3000


@pytest.fixture(scope="module")
def staged_corpus(spark, tmp_path_factory):
    """The corpus split into two arrival waves (file groups)."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    all_pages = generate_pages(spark, N, partitions=4).cache()
    all_pages.where(F.col("warc_offset") < N // 2).write.parquet(f"{src}/wave=0")
    yield root, src, all_pages
    all_pages.unpersist()


@pytest.mark.spark
def test_incremental_arrival_matches_batch(spark, staged_corpus):
    root, src, all_pages = staged_corpus
    out, ckpt = str(root / "out"), str(root / "ckpt")

    # wave 1 arrives → drain
    q = stream_classify(spark, f"{src}/wave=*", out, ckpt)
    q.awaitTermination(300)

    # wave 2 arrives → drain again (same checkpoint: only new files read)
    all_pages.where(F.col("warc_offset") >= N // 2).write.parquet(f"{src}/wave=1")
    q = stream_classify(spark, f"{src}/wave=*", out, ckpt)
    q.awaitTermination(300)

    got = {
        (r["warc_source"], r["url"], r["confidence"])
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        (r["warc_source"], r["url"], r["confidence"])
        for r in classify_bulk(all_pages, min_confidence="medium").collect()
    }
    assert got == expect


@pytest.mark.spark
def test_streaming_no_duplicate_emissions(spark, staged_corpus):
    root, src, _ = staged_corpus
    out, ckpt = str(root / "out2"), str(root / "ckpt2")
    q = stream_classify(spark, f"{src}/wave=*", out, ckpt)
    q.awaitTermination(300)
    res = spark.read.parquet(out)
    assert res.count() == res.select("warc_source", "url").distinct().count()


@pytest.mark.spark
def test_event_time_windowed_counts(spark, staged_corpus):
    root, src, all_pages = staged_corpus
    agg = stream_confidence_counts(spark, f"{src}/wave=*", window="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("conf_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select sum(n) as n from conf_counts").collect()[0]["n"]

    from crawler_spark.plans.flagship import content_sniff_html
    from crawler_spark.functions.detector import detect_udf

    expect = (
        all_pages.where(F.col("rec_type") == "response")
        .where(content_sniff_html(F.col("text")))
        .select(detect_udf(F.col("text")).alias("d"))
        .where(F.col("d.is_nextjs"))
        .count()
    )
    assert got == expect
    # window boundaries are 10-minute aligned
    for r in spark.sql("select window_start, window_end from conf_counts").collect():
        assert r["window_start"].minute % 10 == 0 and r["window_start"].second == 0


@pytest.mark.spark
def test_cross_batch_state_is_bounded_and_exact(spark, tmp_path):
    """The exactly-once sink must NOT do O(total-emitted) work per batch:
    unique batches confirm ~nothing against the seen table (bloom-negative
    fast path), duplicate re-arrivals are suppressed via the confirm join,
    and a replayed committed batch is a no-op."""
    import json

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages(spark, 2000, partitions=2).cache()
    w0 = pages.where(F.col("warc_offset") < 1000)
    w1 = pages.where(F.col("warc_offset") >= 1000)

    w0.write.parquet(f"{src}/wave=0")
    stream_classify(spark, f"{src}/wave=*", out, ckpt).awaitTermination(300)
    w1.write.parquet(f"{src}/wave=1")
    stream_classify(spark, f"{src}/wave=*", out, ckpt).awaitTermination(300)
    # wave 2 re-delivers wave 0's rows in new files → all duplicates
    w0.write.parquet(f"{src}/wave=2")
    stream_classify(spark, f"{src}/wave=*", out, ckpt).awaitTermination(300)

    hist = json.load(open(f"{out}_state/state.json"))["history"]
    assert [h["batch_id"] for h in hist] == [0, 1, 2]
    # batch 1 is all-new: the exact confirm join saw at most bloom-FP rows
    assert hist[1]["confirm_rows"] <= max(3, hist[1]["emitted"] // 20)
    # batch 2 is all-duplicate: confirm caught them, nothing emitted
    assert hist[2]["emitted"] == 0 and hist[2]["confirm_rows"] > 0

    res = spark.read.parquet(out)
    assert res.count() == res.select("warc_source", "url").distinct().count()
    expect = classify_bulk(pages, min_confidence="medium").count()
    assert res.count() == expect

    # replay of committed batches (fresh checkpoint, same state) is a no-op
    before = res.count()
    stream_classify(spark, f"{src}/wave=*", out, str(tmp_path / "ckpt2")).awaitTermination(300)
    assert spark.read.parquet(out).count() == before
    pages.unpersist()
