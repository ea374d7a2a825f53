"""Politeness budget: admitted-set exactness, salting invariance, deferral."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.config import EngineConfig, PolitenessConfig
from crawler_spark.operators.politeness import adaptive_budget, admit_per_host
from crawler_spark.operators.robots import budget_from_crawl_delay, gate

CFG = EngineConfig(skew_threshold=100, skew_salts=4)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "host string, surt string, priority double")


@pytest.fixture(scope="module")
def skewed(spark):
    # mega-host with 500 rows, small host with 3
    rows = [("big.com", f"com,big)/p{i:04d}", float(i % 7)) for i in range(500)]
    rows += [("tiny.io", f"io,tiny)/p{i}", 1.0) for i in range(3)]
    df = _mk(spark, rows).cache()
    df.count()
    yield df
    df.unpersist()


def expected_admitted(rows, budget):
    """Oracle: per host, top-budget by (priority desc, surt asc)."""
    by_host: dict[str, list] = {}
    for h, s, p in rows:
        by_host.setdefault(h, []).append((h, s, p))
    out = set()
    for h, items in by_host.items():
        items.sort(key=lambda t: (-t[2], t[1]))
        out |= {(t[0], t[1]) for t in items[:budget]}
    return out


@pytest.mark.spark
def test_admitted_set_exact_and_salting_invariant(spark, skewed):
    rows = [(r["host"], r["surt"], r["priority"]) for r in skewed.collect()]
    expect = expected_admitted(rows, 65)
    for force in (True, False):
        res = admit_per_host(skewed, budget=65, cfg=CFG, force_salting=force)
        got = {(r["host"], r["surt"]) for r in res.admitted.collect()}
        assert got == expect, f"salting={force}"
        # admitted + deferred == input, disjoint
        n_adm, n_def = res.admitted.count(), res.deferred.count()
        assert n_adm + n_def == len(rows)
        assert n_adm == len(expect)


@pytest.mark.spark
def test_budget_cap_per_host(spark, skewed):
    res = admit_per_host(skewed, budget=10, cfg=CFG)
    per_host = res.admitted.groupBy("host").count().collect()
    assert all(r["count"] <= 10 for r in per_host)
    tiny = [r for r in per_host if r["host"] == "tiny.io"][0]
    assert tiny["count"] == 3  # under-budget host fully admitted


@pytest.mark.spark
def test_per_host_budget_column(spark, skewed):
    with_b = skewed.withColumn(
        "host_budget", F.when(F.col("host") == "big.com", 7).otherwise(2)
    )
    res = admit_per_host(with_b, budget=99, budget_col="host_budget", cfg=CFG)
    got = {r["host"]: r["count"] for r in res.admitted.groupBy("host").count().collect()}
    assert got == {"big.com": 7, "tiny.io": 2}


def test_default_budget_mapping():
    p = PolitenessConfig(rate_per_s=2.0, burst=5, round_duration_s=30)
    assert p.budget_per_round == 65  # burst + rate*duration, request units


def test_adaptive_budget():
    cfg = EngineConfig()
    assert adaptive_budget(2.0, failures_prev=1, successes_prev=50, cfg=cfg) == 1.0
    assert adaptive_budget(0.6, failures_prev=5, successes_prev=0, cfg=cfg) == 0.5
    assert adaptive_budget(2.0, failures_prev=0, successes_prev=10, cfg=cfg) == 2.4
    assert adaptive_budget(9.5, failures_prev=0, successes_prev=99, cfg=cfg) == 10.0
    assert adaptive_budget(2.0, failures_prev=0, successes_prev=3, cfg=cfg) == 2.0


@pytest.mark.spark
def test_robots_gate(spark):
    cand = spark.createDataFrame(
        [
            ("a.com", "/p/1x", "u1"),
            ("a.com", "/q/2", "u2"),
            ("b.org", "/p/1", "u3"),
            ("nohost.net", "/p/9", "u4"),
        ],
        "host string, path string, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", ["/p/1", "/p/2"], 5.0), ("b.org", [], None)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    res = gate(cand, robots)
    assert {r["url"] for r in res.allowed.collect()} == {"u2", "u3", "u4"}
    blocked = res.blocked.collect()
    assert {r["url"] for r in blocked} == {"u1"}
    assert blocked[0]["block_reason"] == "robots_disallow"
    # crawl_delay → per-host budget
    b = budget_from_crawl_delay(res.allowed, round_duration_s=30, default_budget=65)
    got = {r["url"]: r["host_budget"] for r in b.collect()}
    assert got == {"u2": 6, "u3": 65, "u4": 65}
