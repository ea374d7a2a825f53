"""cluster_keep_best argmax semantics + serpentine shard balance."""

from __future__ import annotations

import pytest

from crawler_spark.operators.components import cluster_keep_best
from crawler_spark.operators.fairshare import serpentine_shard_plan


@pytest.mark.spark
def test_cluster_keep_best_argmax_and_ties(spark):
    # cluster 1 = {1, 2, 3}: doc 2 has the best quality -> kept even
    # though min-id would pick 1; cluster 4 = {4, 5} ties on quality ->
    # min doc_id (4) wins; 6 is a singleton -> kept.
    clusters = spark.createDataFrame(
        [
            (1, 1, 3),
            (2, 1, 3),
            (3, 1, 3),
            (4, 4, 2),
            (5, 4, 2),
            (6, 6, 1),
        ],
        ["doc_id", "cluster_id", "cluster_size"],
    )
    docs = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 500), (4, 700), (5, 700), (6, 10)],
        ["doc_id", "quality_pm"],
    )
    rows = {r["doc_id"]: r for r in cluster_keep_best(docs, clusters).collect()}
    assert [d for d in sorted(rows) if rows[d]["is_kept"]] == [2, 4, 6]
    # every cluster keeps exactly one doc; fields pass through
    assert rows[2]["cluster_id"] == 1 and rows[2]["cluster_size"] == 3
    assert rows[5]["quality_pm"] == 700 and not rows[5]["is_kept"]


@pytest.mark.spark
def test_serpentine_shard_plan_balances_skewed_loads(spark):
    # loads 16..1 over 4 shards: serpentine pairs heavy with light —
    # every shard total is the same (34 = (16+1)*8/4/... exact: rows
    # 16,9,8,1 / 15,10,7,2 / 14,11,6,3 / 13,12,5,4 all sum to 34).
    hosts = spark.createDataFrame(
        [(f"h{i:02d}", 17 - i) for i in range(1, 17)], ["host", "load"]
    )
    rows = serpentine_shard_plan(hosts, shards=4).collect()
    assert len(rows) == 4
    assert {r["total_load"] for r in rows} == {34}
    assert all(r["n_hosts"] == 4 for r in rows)
    assert sum(r["load_pm"] for r in rows) <= 1000  # floor per-mille
    # the heaviest host (16) sits on shard 0, second (15) on shard 1...
    by_shard = {r["shard"]: r for r in rows}
    assert by_shard[0]["max_host_load"] == 16
    assert by_shard[3]["max_host_load"] == 13


@pytest.mark.spark
def test_serpentine_shard_plan_fewer_hosts_than_shards(spark):
    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3)], ["host", "load"]
    )
    rows = serpentine_shard_plan(hosts, shards=8).collect()
    assert len(rows) == 2  # only shards 0 and 1 receive hosts
    assert sorted(r["shard"] for r in rows) == [0, 1]
