"""Label-propagation communities vs a pure-Python synchronous twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.communities import (
    LPA_ITERATIONS,
    label_propagation,
)


def _py_lpa(edges, nodes, iterations):
    """Row-at-a-time twin: synchronous majority-label rounds, argmax by
    (count desc, label asc), isolated nodes keep their own label."""
    nbrs: dict[int, set] = {v: set() for v in nodes}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    lbl = {v: v for v in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = lbl[v]
                continue
            cnt: dict[int, int] = {}
            for u in nbrs[v]:
                cnt[lbl[u]] = cnt.get(lbl[u], 0) + 1
            new[v] = min(cnt, key=lambda L: (-cnt[L], L))
        lbl = new
    return lbl


def _run(spark, edges, nodes, iterations=LPA_ITERATIONS):
    e = spark.createDataFrame(edges, ["src", "dst"])
    nd = spark.createDataFrame([(v,) for v in nodes], ["node"])
    rows = label_propagation(e, nd, iterations).collect()
    return {r["doc_id"]: (r["community"], r["csize"]) for r in rows}


@pytest.mark.spark
def test_lpa_two_cliques_and_isolated(spark):
    # two triangles bridged by one edge, plus an isolated node 9
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    nodes = list(range(6)) + [9]
    got = _run(spark, edges, nodes)
    want = _py_lpa(edges, nodes, LPA_ITERATIONS)
    assert {v: c for v, (c, _) in got.items()} == want
    # each triangle collapses to one label; the isolated node keeps its own
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[3][0] == got[4][0] == got[5][0]
    assert got[9] == (9, 1)
    # csize is the community's member count
    sizes: dict[int, int] = {}
    for c, _ in got.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert all(sz == sizes[c] for c, sz in got.values())


@pytest.mark.spark
def test_lpa_matches_python_twin_on_synth_graph(spark):
    from crawler_spark.operators.linkgraph import synth_link_graph

    n = 60
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    e = synth_link_graph(docs, n)
    edges = [(r["src"], r["dst"]) for r in e.collect()]
    nodes = list(range(n))
    got = _run(spark, edges, nodes)
    want = _py_lpa(edges, nodes, LPA_ITERATIONS)
    assert {v: c for v, (c, _) in got.items()} == want


@pytest.mark.spark
def test_lpa_star_adopts_hub_majority(spark):
    # star: leaves see only the hub; hub sees all leaves (distinct
    # labels, count 1 each) and takes the SMALLEST leaf label
    edges = [(0, k) for k in range(1, 5)]
    nodes = list(range(5))
    got = _run(spark, edges, nodes, iterations=1)
    assert all(got[k][0] == 0 for k in range(1, 5))
    assert got[0][0] == 1
