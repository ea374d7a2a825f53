"""Planted-skew guards: hot LSH band buckets, corpus hot buckets in the
incremental admission path, and SemDedup mega-cells.

These are the 10^10-scale failure modes — a band value shared by 10^5
boilerplate-identical docs fans out 10^10 pairs from one bucket; a
skewed embedding distribution puts 30% of the corpus in one cell. The
guards bound the per-bucket/per-cell pair fan-out and trade documented
recall for it. Each test plants the skew and pins both the pruning and
the trade.
"""

from __future__ import annotations

import pytest

from crawler_spark.operators.similarity import semdedup
from crawler_spark.operators.textdedup import (
    lsh_band_table,
    lsh_match_new,
    minhash_lsh_pairs,
)

BOILER = "parked domain placeholder page coming soon check back later again"
TWIN = "completely unrelated twin article body with enough words to shingle"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
def test_minhash_lsh_hot_bucket_pruned(spark):
    # 30 byte-identical boilerplate docs -> every band bucket they share
    # holds 30 members; with cap=10 all of them are pruned and the
    # 30*29/2 = 435 intra-boilerplate pairs never materialize. The
    # genuine twin pair (bucket size 2) survives.
    rows = [(i, BOILER) for i in range(1, 31)] + [(40, TWIN), (41, TWIN)]
    df = _docs(spark, rows)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_bucket_docs=10).collect()
    }
    assert pairs == {(40, 41)}
    # uncapped (the oracle-exact small-SF mode) still yields the full set
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_bucket_docs=None).collect()
    }
    assert (40, 41) in full
    assert len(full) == 435 + 1


@pytest.mark.spark
def test_lsh_match_new_corpus_hot_bucket(spark):
    # corpus: 30 identical boilerplate docs + one normal doc; new batch:
    # one boilerplate copy + one copy of the normal doc. With cap=10 the
    # boilerplate buckets are dropped from the INDEX side, so the
    # boilerplate newcomer has no match (the documented trade — exact-dup
    # md5 catches it) while the normal newcomer still matches.
    corpus = _docs(
        spark, [(i, BOILER) for i in range(1, 31)] + [(50, TWIN)]
    )
    new = _docs(spark, [(100, BOILER), (101, TWIN)])
    got = {
        r["doc_id"]: r["match_id"]
        for r in lsh_match_new(
            lsh_band_table(new), lsh_band_table(corpus), max_bucket_docs=10
        ).collect()
    }
    assert got == {101: 50}
    uncapped = {
        r["doc_id"]: r["match_id"]
        for r in lsh_match_new(
            lsh_band_table(new), lsh_band_table(corpus), max_bucket_docs=None
        ).collect()
    }
    assert uncapped == {100: 1, 101: 50}


def _axis_vec(axis: int, eps: float = 0.0, dim: int = 64) -> list[float]:
    x = [0.0] * dim
    x[axis] = 1.0
    x[(axis + 1) % dim] = eps
    return x


@pytest.mark.spark
def test_semdedup_mega_cell_split(spark):
    # one cell holds 20/23 of the vectors (planted mega-cell). With
    # max_cell_vectors=5 it splits into ceil(20/5)=4 deterministic
    # shards keyed by vec_id % 4; keep-lowest-id then runs per shard,
    # so exactly ids 0..3 survive the mega cell (one per shard) — the
    # cross-shard drops are the documented recall trade. Small cells
    # (nshards=1) keep the original semantics exactly.
    rows = (
        [(i, _axis_vec(0, 0.005 * i), 0) for i in range(20)]
        + [(100, _axis_vec(5), 1), (101, _axis_vec(5, 0.01), 1)]
        + [(200, _axis_vec(30), 2)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup(emb, threshold=0.9, max_cell_vectors=5).collect()
    }
    exp = {i: i in (0, 1, 2, 3) for i in range(20)}
    exp.update({100: True, 101: False, 200: True})
    assert got == exp
    # default cap (no split at this size): single keeper per cell
    flat = {
        r["vec_id"]: r["is_kept"] for r in semdedup(emb, threshold=0.9).collect()
    }
    exp_flat = {i: i == 0 for i in range(20)}
    exp_flat.update({100: True, 101: False, 200: True})
    assert flat == exp_flat
