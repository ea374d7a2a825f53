"""Bow-tie decomposition and collocation-lift tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.cooccur import collocation_topk
from crawler_spark.operators.linkgraph import bowtie_regions


def _regions(spark, edges, node_ids):
    e = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["node"])
    return {r["region"]: r for r in bowtie_regions(e, nodes).collect()}


def test_bowtie_textbook_topology(spark):
    """0→(1↔2 core, with 2 the max-degree pivot)→3; 9 disconnected."""
    edges = [(0, 1), (1, 2), (2, 1), (2, 3)]
    got = _regions(spark, edges, [0, 1, 2, 3, 9])
    assert got["core"]["n_nodes"] == 2 and got["core"]["min_node"] == 1
    assert got["in"]["n_nodes"] == 1 and got["in"]["min_node"] == 0
    assert got["out"]["n_nodes"] == 1 and got["out"]["min_node"] == 3
    assert got["other"]["n_nodes"] == 1 and got["other"]["min_node"] == 9


def test_bowtie_cycle_is_all_core(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _regions(spark, edges, [0, 1, 2])
    assert set(got) == {"core"}
    assert got["core"]["n_nodes"] == 3


def test_bowtie_long_chain_needs_multiple_rounds(spark):
    """A 12-node chain from the pivot exercises the BFS fixpoint well
    past one round. Pivot = node 0? No: max total degree is an interior
    node; the deterministic rule (deg desc, node asc) picks node 1
    (deg 2, smallest id among interior nodes)."""
    edges = [(i, i + 1) for i in range(12)]
    got = _regions(spark, edges, list(range(13)))
    # pivot 1: in = {0}, out = {2..12}, core = {1}
    assert got["core"]["n_nodes"] == 1 and got["core"]["min_node"] == 1
    assert got["in"]["n_nodes"] == 1
    assert got["out"]["n_nodes"] == 11


def test_collocation_lift_ranks_exclusive_pair_first(spark):
    """'rare pairx' always co-occur exclusively -> max lift; 'the'
    co-occurs with everything -> diluted lift."""
    docs = spark.createDataFrame(
        [(i, "the filler%d the rare pairx the" % i) for i in range(8)],
        ["doc_id", "text"],
    )
    rows = collocation_topk(docs, min_count=2, k=5).collect()
    assert rows[0]["a"] == "pairx" and rows[0]["b"] == "rare"
    lifts = [r["lift_pm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_collocation_lift_value_exact(spark):
    # two docs "a b": N=4, ca=cb=2, pair(a,b) cnt=2 -> lift = 2*4*1000/(2*2)
    docs = spark.createDataFrame([(0, "a b"), (1, "a b")], ["doc_id", "text"])
    rows = collocation_topk(docs, min_count=2, k=10).collect()
    got = {(r["a"], r["b"]): r["lift_pm"] for r in rows}
    assert got[("a", "b")] == 2000
