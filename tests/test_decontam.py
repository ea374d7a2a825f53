"""Benchmark decontamination (operators/decontam.py).

Reference oracle: pure-Python rolling n-gram sets over the same rows.
"""

from __future__ import annotations

from crawler_spark.operators.decontam import (
    contamination,
    eval_split,
    train_split,
)


def _grams(text: str, n: int) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_contamination_matches_python_oracle(spark):
    n = 3
    eval_rows = [(100, "the quick brown fox jumps over the lazy dog")]
    train_rows = [
        # shares 'quick brown fox' and more -> contaminated
        (1, "a quick brown fox ran away quickly today"),
        # shares nothing at 3-gram granularity
        (2, "completely unrelated training document text here"),
        # exact copy of the eval doc -> fully contaminated (1000pm)
        (3, "the quick brown fox jumps over the lazy dog"),
        # too short for any 3-gram
        (4, "tiny doc"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contam_pm"], r["is_contaminated"])
        for r in contamination(train, ev, n=n).collect()
    }
    eg = set()
    for _, t in eval_rows:
        eg |= _grams(t, n)
    for i, t in train_rows:
        g = _grams(t, n)
        hits = len(g & eg)
        pm = hits * 1000 // len(g) if g else 0
        assert got[i] == (len(g), hits, pm, hits > 0), (i, got[i])
    assert got[3] == (7, 7, 1000, True)
    assert got[4] == (0, 0, 0, False)


def test_split_partitions_disjoint_and_total(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    ev = {r["doc_id"] for r in eval_split(df).collect()}
    tr = {r["doc_id"] for r in train_split(df).collect()}
    assert ev & tr == set()
    assert ev | tr == set(range(40))
    assert ev == {i for i in range(40) if i % 10 == 7}


def test_contamination_plan_broadcasts_eval_side(spark):
    df = spark.createDataFrame(
        [(i, "w" + " w".join(str(j) for j in range(12)) + f" u{i}") for i in range(30)],
        "doc_id long, text string",
    )
    plan = (
        contamination(train_split(df), eval_split(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
