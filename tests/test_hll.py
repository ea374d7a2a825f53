"""HyperLogLog: exact twin vs a pure-Python simulation + accuracy bound."""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.operators.hll import (
    HLL_ALPHA_PM,
    HLL_M,
    HLL_RHO_CAP,
    LC_RAW_MAX,
    LC_TABLE,
    hll_distinct_report,
    hll_estimate,
    hll_registers,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll(values: list[str], m: int = HLL_M):
    regs: dict[int, int] = {}
    for val in values:
        h = _h64(f"hll:{val}")
        b, v = h % m, h // m
        rho = min(53 if v == 0 else 53 - v.bit_length(), HLL_RHO_CAP)
        regs[b] = max(regs.get(b, 0), rho)
    sp = sum(1 << (HLL_RHO_CAP - r) for r in regs.values())
    s = sp + (m - len(regs)) * (1 << HLL_RHO_CAP)
    numer = HLL_ALPHA_PM * m * m * (1 << HLL_RHO_CAP)
    raw = numer // (1000 * s)
    zeros = m - len(regs)
    est = LC_TABLE[zeros - 1] if zeros > 0 and raw <= LC_RAW_MAX else raw
    return regs, est


@pytest.mark.spark
def test_registers_and_estimate_match_python_simulation(spark):
    vals = [f"u{i}" for i in range(500)] * 3  # duplicates must not matter
    df = spark.createDataFrame(
        [("g", v) for v in vals], "key string, value string"
    )
    regs = hll_registers(df, "key", "value")
    got_regs = {r["bucket"]: r["rho"] for r in regs.collect()}
    py_regs, py_est = _py_hll([f"u{i}" for i in range(500)])
    assert got_regs == py_regs
    est = hll_estimate(regs).collect()
    assert len(est) == 1 and est[0]["est"] == py_est


@pytest.mark.spark
def test_report_error_within_hll_bound(spark):
    # three groups with very different cardinalities; duplicates planted
    rows = []
    for g, n in (("a", 40), ("b", 700), ("c", 3000)):
        rows += [(i % n, g) for i in range(n * 2)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    rep = {r["key"]: r for r in hll_distinct_report(df).collect()}
    assert set(rep) == {"a", "b", "c"}
    for g, n in (("a", 40), ("b", 700), ("c", 3000)):
        r = rep[g]
        assert r["exact"] == n
        # raw estimator (no linear-counting branch): generous 4-sigma
        # band at m=256 (sigma ~ 6.5%) — deterministic, not flaky
        assert abs(r["est"] - n) <= max(0.26 * n, 16), (g, r)
        diff = (r["est"] - r["exact"]) * 1000
        # Spark `div` truncates toward zero (unlike Python floor //)
        assert r["err_pm"] == (abs(diff) // r["exact"]) * (
            1 if diff >= 0 else -1
        )


@pytest.mark.spark
def test_sharded_registers_merge_by_max(spark):
    # union-of-sketches == sketch-of-union: the streaming/merge property
    import pyspark.sql.functions as F

    a = spark.createDataFrame(
        [("g", f"u{i}") for i in range(300)], "key string, value string"
    )
    b = spark.createDataFrame(
        [("g", f"u{i}") for i in range(150, 450)], "key string, value string"
    )
    merged = (
        hll_registers(a, "key", "value")
        .unionByName(hll_registers(b, "key", "value"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = hll_registers(a.unionByName(b), "key", "value")
    assert {
        (r["bucket"], r["rho"]) for r in merged.collect()
    } == {(r["bucket"], r["rho"]) for r in direct.collect()}
