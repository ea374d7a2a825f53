"""HITS hubs/authorities and the HLL sketch-union rollup — pinned
against pure-Python re-derivations of the exact integer semantics."""

from __future__ import annotations

import pytest

from crawler_spark.operators.hll import hll_registers, hll_union_report
from crawler_spark.operators.linkgraph import HITS_SCALE, hits

# hub 0 cites the cluster {1,2,3}; hub 4 overlaps on {1,2}; 5 adds one
# more citation to 1 — so 1 is the strongest authority and 0 the
# strongest hub, with 6 as an isolated vertex (must land at 0/0)
EDGES = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (5, 1)]
NODES = list(range(7))


def _py_hits(edges, nodes, iters):
    def l1(raw):
        tot = sum(raw.values())
        den = max(tot // 10**6, 1)
        return {v: raw.get(v, 0) * 1000 // den for v in nodes}

    h = {v: HITS_SCALE for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        raw_a: dict = {}
        for s, d in edges:
            raw_a[d] = raw_a.get(d, 0) + h[s]
        a = l1(raw_a)
        raw_h: dict = {}
        for s, d in edges:
            raw_h[s] = raw_h.get(s, 0) + a[d]
        h = l1(raw_h)
    return a, h


@pytest.mark.spark
@pytest.mark.parametrize("iters", [1, 3])
def test_hits_matches_python_reference(spark, iters):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    n = spark.createDataFrame([(v,) for v in NODES], ["node"])
    got = {
        r["doc_id"]: (r["auth_ppb"], r["hub_ppb"])
        for r in hits(e, n, iterations=iters).collect()
    }
    a, h = _py_hits(EDGES, NODES, iters)
    assert got == {v: (a[v], h[v]) for v in NODES}
    # structural sanity: 1 is the top authority, 0 the top hub,
    # the isolated vertex is exactly zero on both axes
    assert max(a, key=a.get) == 1
    assert max(h, key=h.get) == 0
    assert got[6] == (0, 0)


@pytest.mark.spark
def test_hll_union_equals_sketch_of_union(spark):
    # THE merge property: max-merging per-group register tables yields
    # byte-identical registers to sketching the whole stream at once
    rows = [(f"t{i % 5}", str(i * 37 % 400)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["key", "value"])
    merged = (
        hll_registers(df, "key", "value")
        .groupBy("bucket")
        .agg({"rho": "max"})
        .withColumnRenamed("max(rho)", "rho")
    )
    from pyspark.sql import functions as F

    direct = hll_registers(
        df.withColumn("key", F.lit("all")), "key", "value"
    ).select("bucket", "rho")
    got = {r["bucket"]: r["rho"] for r in merged.collect()}
    want = {r["bucket"]: r["rho"] for r in direct.collect()}
    assert got == want


@pytest.mark.spark
def test_hll_union_report_columns(spark):
    rows = [(i, f"t{i % 3}", i % 200) for i in range(600)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "user_id"])
    out = hll_union_report(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_global"] == 200
    # groups overlap heavily, so the naive per-group sum overcounts
    assert r["naive_group_sum"] == 600
    # sketch error within ~4x the 6.5% design bound at this tiny n
    assert abs(r["merged_est"] - 200) <= 52
