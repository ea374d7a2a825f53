"""Skip-gram co-occurrence counts vs a hand-rolled pure-Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from crawler_spark.operators.cooccur import skipgram_pairs


def _py_skipgrams(texts, window, min_count):
    cnt: Counter = Counter()
    wpm: Counter = Counter()
    for t in texts:
        ws = t.split(" ")
        for d in range(1, window + 1):
            for i in range(len(ws) - d):
                a, b = sorted((ws[i], ws[i + d]))
                cnt[(a, b)] += 1
                wpm[(a, b)] += 1000 // d
    return {
        k: (c, wpm[k]) for k, c in cnt.items() if c >= min_count
    }


@pytest.mark.spark
def test_skipgram_pairs_match_python_oracle(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the mat",
        "a b a b a",  # repeats + self-pairs at distance 2
        "x",  # shorter than any window
        "y z",  # only d=1 fires
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r["a"], r["b"]): (r["cnt"], r["w_pm"])
        for r in skipgram_pairs(df, window=3, min_count=2).collect()
    }
    assert got == _py_skipgrams(texts, 3, 2)


@pytest.mark.spark
def test_skipgram_self_pair_and_orientation(spark):
    # 'a b a': (a,b) at d=1 twice, (a,a) self-pair at d=2 once
    df = spark.createDataFrame([(0, "a b a")], ["doc_id", "text"])
    rows = skipgram_pairs(df, window=2, min_count=1).collect()
    by_pair = {(r["a"], r["b"]): r for r in rows}
    assert by_pair[("a", "b")]["cnt"] == 2
    assert by_pair[("a", "b")]["w_pm"] == 2000
    assert by_pair[("a", "a")]["cnt"] == 1
    assert by_pair[("a", "a")]["w_pm"] == 500
    # canonical orientation: never a > b
    assert all(r["a"] <= r["b"] for r in rows)
