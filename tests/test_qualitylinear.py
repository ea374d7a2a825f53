"""Hashed linear quality scorer: exact vs a pure-Python reference."""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.operators.qualitylinear import (
    QL_BUCKETS,
    QL_WEIGHT_RANGE,
    hashed_quality_scores,
    quality_weights,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_score(text: str):
    toks = [t for t in text.split(" ") if t != ""]
    if not toks:
        return None
    ws = [
        _h64(f"qw:{_h64('q:' + t) % QL_BUCKETS}") % QL_WEIGHT_RANGE - 1000
        for t in toks
    ]
    s = sum(ws)
    # Spark/DuckDB integer div truncates toward zero
    q = abs(s) // len(ws)
    score = q if s >= 0 else -q
    return len(ws), score, "keep" if score >= 0 else "drop"


@pytest.mark.spark
def test_scores_match_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "buy cheap pills now now now now",
        "a",
        "x  y",  # double space -> empty token filtered
    ]
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"], r["label"])
        for r in hashed_quality_scores(docs, quality_weights(spark)).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_score(t), (i, t)


@pytest.mark.spark
def test_empty_doc_drops_out(spark):
    docs = spark.createDataFrame(
        [(0, "", "s"), (1, " ", "s"), (2, "word", "s")],
        "doc_id long, text string, source string",
    )
    got = hashed_quality_scores(docs, quality_weights(spark)).collect()
    assert {r["doc_id"] for r in got} == {2}


@pytest.mark.spark
def test_weight_table_is_deterministic(spark):
    w = {r["bucket"]: r["w_ppm"] for r in quality_weights(spark, 64).collect()}
    assert len(w) == 64
    assert all(-1000 <= v <= 1000 for v in w.values())
    assert w[0] == _h64("qw:0") % QL_WEIGHT_RANGE - 1000
