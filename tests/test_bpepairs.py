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
