"""Corpus data card vs hand-computed shares."""

from __future__ import annotations

import pytest

from crawler_spark.operators.datacard import corpus_data_card


@pytest.mark.spark
def test_data_card_shares_and_totals(spark):
    # two obviously-English high-ish docs and one garbage doc
    texts = [
        "the quick brown fox and the lazy dog with a long tail "
        "and the other fox is of the same kind in a den of foxes "
        "and the story goes on with more of the usual words here",
        "the cat and the dog are in the house with a mouse and "
        "the bird is of the tree in a nest of twigs and the sun "
        "is up over the hill with a warm light on the grass now",
        "zzz qqq xxx",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = corpus_data_card(df).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    total_tokens = sum(r["n_tokens"] for r in rows)
    assert total_docs == 3
    # shares are per-mille of the respective totals (floor division)
    for r in rows:
        assert r["docs_pm"] == r["n_docs"] * 1000 // total_docs
        assert r["tokens_pm"] == r["n_tokens"] * 1000 // total_tokens
        assert r["avg_words"] >= 1
    # the garbage doc has no marker words -> 'und', and its 3 words
    # score low quality
    und = [r for r in rows if r["lang"] == "und"]
    assert len(und) == 1 and und[0]["quality_bucket"] == "low"
    assert und[0]["n_docs"] == 1 and und[0]["n_tokens"] == 3
    # the English docs land in one 'en' cell, n_docs == 2
    en = [r for r in rows if r["lang"] == "en"]
    assert sum(r["n_docs"] for r in en) == 2
