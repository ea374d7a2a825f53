"""End-to-end dedup cascade tests."""

from __future__ import annotations

from crawler_spark.operators.cascade import cascade_input, dedup_cascade


def _ledger(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["stage"]: r for r in dedup_cascade(docs).collect()}


def test_cascade_exact_stage_collapses_byte_duplicates(spark):
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    got = _ledger(spark, [(0, base), (1, base), (2, base), (3, other)])
    assert got["raw"]["n_docs"] == 4
    assert got["exact"]["n_docs"] == 2  # min-id survivor per hash
    assert got["neardup_keep_best"]["n_docs"] == 2  # disjoint texts


def test_cascade_neardup_stage_keeps_one_per_cluster(spark):
    base = " ".join(f"w{i}" for i in range(40))
    neardup = base + " tailword"
    other = " ".join(f"z{i}" for i in range(40))
    got = _ledger(spark, [(0, base), (1, neardup), (2, other)])
    assert got["exact"]["n_docs"] == 3  # no byte dups
    assert got["neardup_keep_best"]["n_docs"] == 2


def test_cascade_token_ledger_monotone(spark):
    rows = [(i, " ".join(f"t{i % 3}x{j}" for j in range(20))) for i in range(12)]
    got = _ledger(spark, rows)
    assert (
        got["raw"]["n_tokens"]
        >= got["exact"]["n_tokens"]
        >= got["neardup_keep_best"]["n_tokens"]
    )
    assert got["raw"]["n_tokens"] == 12 * 20


def test_cascade_input_plants_duplicates(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], ["doc_id", "text"]
    )
    aug = cascade_input(docs)
    assert aug.count() == 52  # 50 + ids 0 and 25 re-added
    got = _ledger(spark, [(r["doc_id"], r["text"]) for r in aug.collect()])
    assert got["raw"]["n_docs"] == 52
    assert got["exact"]["n_docs"] == 50  # planted copies collapsed
