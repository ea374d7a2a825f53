"""Harmonic centrality (per-node HyperANF in-balls) tests.

Two independent paths to the same integers: exact hand values on tiny
graphs (where linear counting is exact, same regime as the hyperanf
tests), and a pure-Python twin that recomputes the full pipeline —
exact BFS in-balls pushed through the portable-HLL estimator — on the
synthetic link graph.
"""

from __future__ import annotations

import hashlib

from crawler_spark.operators.hll import (
    HLL_ALPHA_PM,
    HLL_M,
    HLL_RHO_CAP,
    LC_RAW_MAX,
    LC_TABLE,
)
from crawler_spark.operators.linkgraph import (
    ANF_ROUNDS,
    HC_SCALE,
    harmonic_centrality,
    harmonic_over_documents,
    synth_link_graph,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll_est(values: set[int]) -> int:
    """Portable-HLL estimate of a set of node ids (twin of
    tests/test_hll._py_hll, keyed the way hll_registers keys nodes)."""
    m = HLL_M
    regs: dict[int, int] = {}
    for val in values:
        h = _h64(f"hll:{val}")
        b, v = h % m, h // m
        rho = min(53 if v == 0 else 53 - v.bit_length(), HLL_RHO_CAP)
        regs[b] = max(regs.get(b, 0), rho)
    sp = sum(1 << (HLL_RHO_CAP - r) for r in regs.values())
    s = sp + (m - len(regs)) * (1 << HLL_RHO_CAP)
    raw = (HLL_ALPHA_PM * m * m * (1 << HLL_RHO_CAP)) // (1000 * s)
    zeros = m - len(regs)
    return LC_TABLE[zeros - 1] if zeros > 0 and raw <= LC_RAW_MAX else raw


def _py_harmonic(edges, n, rounds):
    """Exact in-balls by BFS, then the SAME clamped 1/t fold over the
    SAME HLL estimates the Spark side produces."""
    preds: dict[int, set[int]] = {v: set() for v in range(n)}
    for u, v in edges:
        preds[v].add(u)
    hc = {}
    for v in range(n):
        ball = {v}
        prev_est = _py_hll_est(ball)
        total = 0
        for t in range(1, rounds + 1):
            ball |= {u for w in ball for u in preds[w]}
            est = _py_hll_est(ball)
            total += max(est - prev_est, 0) * HC_SCALE // t
            prev_est = est
        hc[v] = total
    return hc


def test_harmonic_chain_exact(spark):
    # chain 0→1→2→3: hc = [0, 1000, 1500, 1833] at 3 rounds
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    nodes = spark.range(4).selectExpr("id AS node")
    got = {
        r["doc_id"]: r["hc_milli"]
        for r in harmonic_centrality(e, nodes, rounds=3).collect()
    }
    assert got == {0: 0, 1: 1000, 2: 1500, 3: 1000 + 500 + 1000 // 3}


def test_harmonic_star_hub(spark):
    # 4 leaves each pointing at hub 4: hub collects 4·1/1, leaves 0
    e = spark.createDataFrame([(u, 4) for u in range(4)], "src long, dst long")
    nodes = spark.range(5).selectExpr("id AS node")
    got = {
        r["doc_id"]: r["hc_milli"]
        for r in harmonic_centrality(e, nodes, rounds=2).collect()
    }
    assert got[4] == 4000
    assert all(got[u] == 0 for u in range(4))


def test_harmonic_matches_python_twin_on_synth_graph(spark):
    n = 50
    docs = spark.range(n).selectExpr("id AS doc_id")
    edges = synth_link_graph(docs, n)
    py_edges = [(r["src"], r["dst"]) for r in edges.collect()]
    expected = _py_harmonic(py_edges, n, ANF_ROUNDS)
    got = {
        r["doc_id"]: r["hc_milli"]
        for r in harmonic_centrality(
            edges, docs.selectExpr("doc_id AS node"), rounds=ANF_ROUNDS
        ).collect()
    }
    assert got == expected


def test_harmonic_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert harmonic_over_documents(docs).count() == 0


def test_harmonic_matches_twin_on_random_graphs(spark):
    """Seeded random digraphs (chains + islands) against the exact-BFS
    + portable-HLL pure-Python twin."""
    import random

    rng = random.Random(777)
    edges = set()
    n = 40
    for a in range(n):
        for _ in range(rng.randint(0, 3)):
            b = rng.randrange(n)
            if b != a:
                edges.add((a, b))
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    nodes = spark.range(n).selectExpr("id AS node")
    expected = _py_harmonic(sorted(edges), n, ANF_ROUNDS)
    got = {
        r["doc_id"]: r["hc_milli"]
        for r in harmonic_centrality(e, nodes, rounds=ANF_ROUNDS).collect()
    }
    assert got == expected
