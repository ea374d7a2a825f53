"""PageRank frontier-priority operator vs an independent pure-Python twin."""

from __future__ import annotations

from crawler_spark.operators.linkgraph import (
    LINK_MAX_DEG,
    LINK_MULT,
    LINK_STEP,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERATIONS,
    PR_SCALE,
    pagerank,
    synth_link_graph,
)


def _py_pagerank(edges, n, iterations):
    """Row-at-a-time twin of the exact integer power iteration."""
    out_deg: dict[int, int] = {}
    for u, _ in edges:
        out_deg[u] = out_deg.get(u, 0) + 1
    init = PR_SCALE // n
    base = (init * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    rank = {v: init for v in range(n)}
    for _ in range(iterations):
        sums = {v: 0 for v in range(n)}
        for u, v in edges:
            sums[v] += rank[u] // out_deg[u]
        rank = {v: base + (PR_DAMP_NUM * s) // PR_DAMP_DEN for v, s in sums.items()}
    return rank, out_deg


def _py_graph(n):
    edges = set()
    for u in range(n):
        for k in range(1, u % LINK_MAX_DEG + 2):
            v = (u * LINK_MULT + LINK_STEP * k) % n
            if v != u:
                edges.add((u, v))
    return sorted(edges)


def test_pagerank_matches_python_twin(spark):
    n = 40
    docs = spark.range(n).selectExpr("id AS doc_id")
    edges = synth_link_graph(docs, n)
    got = {
        r["doc_id"]: (r["out_deg"], r["in_deg"], r["rank_ppb"])
        for r in pagerank(
            edges, docs.selectExpr("doc_id AS node"), n, PR_ITERATIONS
        ).collect()
    }
    py_edges = _py_graph(n)
    assert sorted((r["src"], r["dst"]) for r in edges.collect()) == py_edges
    rank, out_deg = _py_pagerank(py_edges, n, PR_ITERATIONS)
    in_deg: dict[int, int] = {}
    for _, v in py_edges:
        in_deg[v] = in_deg.get(v, 0) + 1
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == (out_deg.get(v, 0), in_deg.get(v, 0), rank[v])


def test_pagerank_properties(spark):
    # hand graph: hub 0 -> {1,2,3}; chain 1->2->3; 4 isolated
    rows = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    nodes = spark.range(5).selectExpr("id AS node")
    res = {r["doc_id"]: r for r in pagerank(edges, nodes, 5, 3).collect()}
    init = PR_SCALE // 5
    base = (init * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    # no in-links (0 and the isolate) -> exactly base after any iteration
    assert res[0]["rank_ppb"] == base
    assert res[4]["rank_ppb"] == base
    assert res[4]["out_deg"] == 0 and res[4]["in_deg"] == 0
    # 3 receives from both 0 and the chain -> strictly richest
    assert res[3]["rank_ppb"] == max(r["rank_ppb"] for r in res.values())
    # mass never exceeds the injected total (dangling mass is dropped)
    assert sum(r["rank_ppb"] for r in res.values()) <= PR_SCALE


def test_pagerank_empty_corpus(spark):
    from crawler_spark.operators.linkgraph import pagerank_over_documents

    docs = spark.createDataFrame([], "doc_id long, text string")
    res = pagerank_over_documents(docs)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "doc_id", "out_deg", "in_deg", "rank_ppb",
    ]


def test_pagerank_plan_shape(spark):
    n = 40
    docs = spark.range(n).selectExpr("id AS doc_id")
    res = pagerank(
        synth_link_graph(docs, n), docs.selectExpr("doc_id AS node"), n, 2
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure join + partial-agg iterations


def test_host_link_summary_topk_and_exclusions(spark):
    from crawler_spark.operators.linkgraph import host_link_summary

    edges = spark.createDataFrame(
        # h1 -> h2 twice, h1 -> h3 once, h1 intra-host once (dropped),
        # h2 -> h1 once
        [(0, 10), (1, 11), (2, 20), (3, 0), (0, 1), (10, 0)],
        "src long, dst long",
    )
    hosts = spark.createDataFrame(
        [(i, "h1") for i in (0, 1, 2, 3)]
        + [(i, "h2") for i in (10, 11)]
        + [(20, "h3")],
        "doc_id long, host string",
    )
    got = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["rk"])
        for r in host_link_summary(edges, hosts, k=1).collect()
    }
    # k=1: h1 keeps only its top target (h2, 2 links); h3 row cut
    assert got == {("h1", "h2"): (2, 1), ("h2", "h1"): (1, 1)}


def test_rank_resolution_guard_fires():
    """A graph with n near PR_SCALE would truncate every node's integer
    mass to ~0 — the loops must fail fast, not compute garbage."""
    import pytest as _pytest

    from crawler_spark.operators.linkgraph import (
        PR_SCALE,
        RANK_MIN_RESOLUTION,
        _check_rank_resolution,
    )

    _check_rank_resolution(PR_SCALE // RANK_MIN_RESOLUTION)  # boundary ok
    with _pytest.raises(ValueError, match="raise PR_SCALE"):
        _check_rank_resolution(PR_SCALE // RANK_MIN_RESOLUTION + 1)
