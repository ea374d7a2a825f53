"""Seeded shuffle: determinism, partition independence, seed sensitivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.shardshuffle import SHUFFLE_SHARDS, seeded_shuffle


@pytest.mark.spark
def test_deterministic_and_partition_independent(spark):
    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    a = sorted(seeded_shuffle(docs, "s1").collect())
    b = sorted(seeded_shuffle(docs.repartition(7), "s1").collect())
    assert a == b  # physical partitioning cannot change the layout
    # per-shard pos is contiguous 1..n
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(SHUFFLE_SHARDS))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@pytest.mark.spark
def test_seed_changes_permutation(spark):
    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in seeded_shuffle(docs, "s1").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in seeded_shuffle(docs, "s2").collect()}
    assert a != b
    moved = sum(1 for d in a if a[d] != b[d])
    assert moved > 300  # nearly everything moves
