"""operators/chunking.py — sliding-window text chunking."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.chunking import chunk_text


def _chunks(spark, text, window, stride):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return [
        (r["chunk_idx"], r["word_start"], r["n_words"], r["chunk"])
        for r in chunk_text(df, window, stride).orderBy("chunk_idx").collect()
    ]


def test_overlap_and_boundaries(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _chunks(spark, text, window=4, stride=3)
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 3, 4, "w3 w4 w5 w6"),          # 1-word overlap
        (2, 6, 4, "w6 w7 w8 w9"),
        # start 9 would add only already-seen w9? no: w9 is covered by
        # chunk 2's window, so no 4th chunk: ceil((10-1)/3) = 3 chunks
    ]
    # every word appears in at least one chunk
    covered = set()
    for _, start, n, _ in got:
        covered |= set(range(start, start + n))
    assert covered == set(range(10))


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, "a b", window=40, stride=30)
    assert got == [(0, 0, 2, "a b")]


def test_no_overlap_stride_equals_window(spark):
    text = " ".join(f"w{i}" for i in range(7))
    got = _chunks(spark, text, window=3, stride=3)
    assert [g[3] for g in got] == ["w0 w1 w2", "w3 w4 w5", "w6"]


def test_exact_multiple_no_empty_tail(spark):
    text = " ".join(f"w{i}" for i in range(6))
    got = _chunks(spark, text, window=3, stride=3)
    assert [g[2] for g in got] == [3, 3]  # no empty third chunk


def test_bad_stride_rejected(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text(df, window=3, stride=0)
    with pytest.raises(ValueError):
        chunk_text(df, window=3, stride=4)


def test_pure_map_stage(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    plan = chunk_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
