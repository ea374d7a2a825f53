"""ngram_lm_counts: planted-corpus exactness, pruning, short-doc guard."""

from __future__ import annotations

from collections import Counter

import pytest

from crawler_spark.operators.ngramlm import RF_SCALE, ngram_lm_counts


def _py_reference(texts: list[str], max_order: int, prune_min: int):
    """Independent row-at-a-time reference (same split semantics)."""
    counts = {n: Counter() for n in range(1, max_order + 1)}
    for t in texts:
        w = t.split(" ")
        for n in range(1, max_order + 1):
            for i in range(len(w) - n + 1):
                counts[n][" ".join(w[i : i + n])] += 1
    total = sum(counts[1].values())
    rows = set()
    for g, c in counts[1].items():
        rows.add((1, g, c, total, c * RF_SCALE // total))
    for n in range(2, max_order + 1):
        for g, c in counts[n].items():
            if c < prune_min:
                continue
            prefix = g.rsplit(" ", 1)[0]
            ctx = counts[n - 1][prefix]
            if n - 1 >= 2 and ctx < prune_min:
                continue  # context pruned (cannot happen: ctx >= c)
            rows.add((n, g, c, ctx, c * RF_SCALE // ctx))
    return rows


@pytest.mark.spark
def test_planted_corpus_exact(spark):
    texts = [
        "a b a b c",
        "a b a",
        "c c b a b",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["n"], r["gram"], r["cnt"], r["ctx_cnt"], r["rf_pm"])
        for r in ngram_lm_counts(docs).collect()
    }
    assert got == _py_reference(texts, 3, 2)
    # spot checks: "a b" appears 4x, context "a" 5x -> rf 800
    assert (2, "a b", 4, 5, 800) in got
    # pruned: trigram "b a b" appears 2x (kept), "a b c" once (pruned)
    assert any(g == "b a b" for (_, g, *_r) in got)
    assert not any(g == "a b c" for (_, g, *_r) in got)


@pytest.mark.spark
def test_short_docs_do_not_crash(spark):
    # 1-word and 2-word docs exercise the sequence(1,0)-descending guard
    docs = spark.createDataFrame(
        [("x",), ("x y",), ("",)], "text string"
    )
    rows = ngram_lm_counts(docs).collect()
    by_n = Counter(r["n"] for r in rows)
    assert by_n[3] == 0  # no doc has 3 words
    # "" splits to [''] -> one empty-string unigram, same as DuckDB
    assert any(r["gram"] == "" and r["n"] == 1 for r in rows)


@pytest.mark.spark
def test_context_join_lossless(spark):
    """Every surviving n-gram keeps its backoff row: the prune threshold
    is monotone (prefix count >= gram count), so the inner context join
    drops nothing."""
    texts = ["d e f d e f d e", "e f d e f"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    out = ngram_lm_counts(docs)
    pre = _py_reference(texts, 3, 2)
    assert out.count() == len(pre)
