"""BPE first-merge pair counts vs a pure-Python re-derivation."""

from __future__ import annotations

import pytest

from crawler_spark.operators.termstats import bpe_pair_counts


def _py_pairs(texts, k):
    cnt: dict = {}
    for t in texts:
        for w in t.split(" "):
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                cnt[p] = cnt.get(p, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return dict(ranked)


@pytest.mark.spark
def test_bpe_pairs_match_python_reference(spark):
    texts = [
        "low lower lowest",
        "new newer newest",
        "a xx",  # 1-char word contributes nothing; 'xx' one pair
        "wider wide widest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(df, k=8).collect()}
    assert got == _py_pairs(texts, 8)
    # the classic: 'lo'/'we' style shared stems dominate
    assert "we" in got and got["we"] >= 4


def _py_merge_round(texts, k):
    """Pure-Python twin of round two: find merge #1 over raw words,
    apply it greedily left-to-right, re-count symbol pairs."""
    ranked = sorted(_py_pairs(texts, 10**9).items(), key=lambda kv: (-kv[1], kv[0]))
    m1 = ranked[0][0]
    cnt: dict = {}
    for t in texts:
        for w in t.split(" "):
            if len(w) < 2 or "\x01" in w:
                continue
            w2 = w.replace(m1, "\x01")
            if len(w2) < 2:
                continue
            for i in range(len(w2) - 1):
                p = w2[i : i + 2].replace("\x01", f"({m1})")
                cnt[p] = cnt.get(p, 0) + 1
    return dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]), m1


@pytest.mark.spark
def test_bpe_merge_round_matches_python_reference(spark):
    from crawler_spark.operators.termstats import bpe_merge_round

    texts = [
        "low lower lowest low",
        "new newer newest lowly",
        "slow slower aaaa",  # 'aaaa' exercises greedy non-overlap
        "wider wide widest low",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["pair"]: r["cnt"] for r in bpe_merge_round(df, k=30).collect()}
    want, m1 = _py_merge_round(texts, 30)
    assert got == want
    # the winning merge appears as a fused symbol in round-2 pairs
    assert any(f"({m1})" in p for p in got)


@pytest.mark.spark
def test_bpe_merge_round_greedy_nonoverlap(spark):
    from crawler_spark.operators.termstats import bpe_merge_round

    # merge #1 in this corpus is 'aa' (6 occurrences); 'aaaa' must
    # re-segment as (aa)(aa) — NOT three overlapping 'aa' hits
    df = spark.createDataFrame(
        [(0, "aaaa aab aab baa baa")], ["doc_id", "text"]
    )
    got = {r["pair"]: r["cnt"] for r in bpe_merge_round(df, k=30).collect()}
    assert got["(aa)(aa)"] == 1
    assert got["(aa)b"] == 2
    assert got["b(aa)"] == 2
