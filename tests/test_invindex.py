"""Inverted index: salted two-phase min-K vs a pure-Python direct build."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from crawler_spark.operators.invindex import inverted_index


def _py_index(docs: list[tuple[int, str]], head_k: int, min_df: int):
    df: Counter = Counter()
    cnt: Counter = Counter()
    postings = defaultdict(set)
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        for t in set(toks):
            df[t] += 1
            postings[t].add(doc_id)
        cnt.update(toks)
    return {
        t: (df[t], cnt[t], sorted(postings[t])[:head_k])
        for t in df
        if df[t] >= min_df
    }


@pytest.mark.spark
def test_matches_python_direct_build(spark):
    # planted stopword ('the' in every doc) to exercise the skew path;
    # hapax terms to exercise min_df pruning; repeats for tf > df
    docs = [
        (i, f"the term{i % 7} term{i % 7} rare{i} shared")
        for i in range(60)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["cnt"], list(r["postings_head"]))
        for r in inverted_index(sdf, head_k=5, min_df=2).collect()
    }
    exp = _py_index(docs, head_k=5, min_df=2)
    assert got == exp
    assert "rare3" not in got  # hapax pruned
    assert got["the"][0] == 60 and got["the"][2] == [0, 1, 2, 3, 4]
    assert got["term0"][1] == 2 * got["term0"][0]  # tf doubles df


@pytest.mark.spark
def test_salting_is_output_invariant(spark):
    docs = [(i, "x common y" if i % 2 else "x only") for i in range(40)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    a = inverted_index(sdf, head_k=3, min_df=1, salt=1)
    b = inverted_index(sdf, head_k=3, min_df=1, salt=16)
    ra = sorted((r["term"], r["df"], r["cnt"], tuple(r["postings_head"]))
                for r in a.collect())
    rb = sorted((r["term"], r["df"], r["cnt"], tuple(r["postings_head"]))
                for r in b.collect())
    assert ra == rb
