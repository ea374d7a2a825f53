"""Redirect resolution: chains, rho/cycles, hop counts, python parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.redirects import (
    resolve_redirects,
    synth_redirect_edges,
)


@pytest.mark.spark
def test_chains_cycles_and_hops(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "T1"),      # 3-hop chain
            ("d", "T2"),                                # 1 hop
            ("x", "y"), ("y", "x"),                     # 2-cycle
            ("z", "x"),                                 # rho tail into it
        ],
        "src string, dst string",
    )
    got = {r["url"]: (r["final_url"], r["hops"], r["unresolved"])
           for r in resolve_redirects(edges).collect()}
    assert got["a"] == ("T1", 3, False)
    assert got["b"] == ("T1", 2, False)
    assert got["c"] == ("T1", 1, False)
    assert got["d"] == ("T2", 1, False)
    assert got["x"] == (None, None, True)
    assert got["y"] == (None, None, True)
    assert got["z"] == (None, None, True)


@pytest.mark.spark
def test_long_chain_within_cap(spark):
    # 30 hops < 2^5 cap: resolves; head hop count exact
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    got = {r["url"]: (r["final_url"], r["hops"]) for r in resolve_redirects(edges).collect()}
    assert got["n0"] == ("n30", 30)
    assert got["n29"] == ("n30", 1)


@pytest.mark.spark
def test_synth_matches_sequential_walk(spark):
    """Pointer doubling == the sequential walk it replaces, on the
    driver-query synth (chains + planted 55<->57 cycles + rho tails)."""
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    edges = {r["src"]: r["dst"] for r in synth_redirect_edges(docs).collect()}

    def walk(u):
        cur, hops = edges[u], 1
        while cur in edges and hops < 64:
            cur, hops = edges[cur], hops + 1
        return (None, None, True) if cur in edges else (cur, hops, False)

    got = {r["url"]: (r["final_url"], r["hops"], r["unresolved"])
           for r in resolve_redirects(synth_redirect_edges(docs)).collect()}
    assert set(got) == set(edges)
    for u in edges:
        assert got[u] == walk(u), u
