"""Connected components / duplicate clustering (operators/components.py).

Reference oracle: pure-Python BFS over the same edge list — independent
of the Spark large-star/small-star implementation.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawler_spark.operators.components import connected_components, dedup_clusters


def _bfs_components(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {u: set() for u in n_nodes}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label: dict[int, int] = {}
    for start in sorted(adj):
        if start in label:
            continue
        stack, seen = [start], {start}
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(seen)
        for u in seen:
            label[u] = m
    return label


def _run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_chain_and_cliques(spark):
    # chain 0-1-2-...-9 (pathological for naive propagation), two cliques,
    # one isolated pair, duplicate + reversed edges thrown in
    edges = [(i, i + 1) for i in range(9)]
    edges += [(a, b) for a in (20, 21, 22) for b in (20, 21, 22) if a < b]
    edges += [(31, 30), (30, 31), (40, 41)]
    got = _run_cc(spark, edges)
    want = _bfs_components(sorted({x for e in edges for x in e}), edges)
    # BFS labels every node; spark result omits nothing here (all on edges)
    assert got == want


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(rng.randrange(20, 60)))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randrange(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _run_cc(spark, edges)
        want = _bfs_components(sorted({x for e in edges for x in e}), edges)
        assert got == want, f"trial {trial}"


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    for d in (0, 2, 4):  # singletons
        assert rows[d]["cluster_id"] == d
        assert rows[d]["cluster_size"] == 1
        assert rows[d]["is_canonical"]
    for d in (1, 3, 5):
        assert rows[d]["cluster_id"] == 1
        assert rows[d]["cluster_size"] == 3
        assert rows[d]["is_canonical"] == (d == 1)
    assert rows[7]["cluster_id"] == 6 and rows[7]["cluster_size"] == 2
    # deduped corpus = canonical rows only: one survivor per cluster
    n_clusters = len({r["cluster_id"] for r in rows.values()})
    assert sum(1 for r in rows.values() if r["is_canonical"]) == n_clusters == 5


def test_cc_no_window_no_crossjoin(spark):
    """Plan shape: star contraction must stay partial-agg + equi-join —
    no Window, no cartesian product anywhere."""
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    plan = connected_components(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
