"""Max-min fair crawl-budget allocation (water-filling) across hosts.

The politeness layer (operators/politeness.py) caps how fast one host
may be fetched; this operator answers the OTHER scheduling question a
fleet crawl has every round: the global round budget B (fetch slots,
bandwidth tokens) is smaller than total demand, so how many of each
host's pending URLs get admitted? Max-min fairness is the standard
answer (progressive filling / water-filling — Bertsekas & Gallager,
"Data Networks" §6.5.2): raise one water level θ until the budget is
spent; every host gets min(demand, θ), so no host can gain except by
taking from a poorer one. Proportional-to-demand allocation would let
a link-farm with 10^7 pending URLs starve everyone else — exactly the
skew this guards against.

Exact integer semantics (the oracle mirrors every step):
- θ* = largest integer with S(θ) = Σ_i min(d_i, θ) ≤ B;
- remainder r = B − S(θ*) (< |{d > θ*}| by maximality) goes as +1 to
  the r hosts with d > θ* that sort first by host name — an arbitrary
  but total and engine-portable tie-break.

Scale shape (10^8 hosts):
- demands collapse to DISTINCT LEVELS first (one partial agg): the
  running sum S(v) needs one ordered pass over distinct demand VALUES,
  which are bounded by max pending count, not host count — the same
  documented bound as latency_quantiles' exact path;
- θ and r are two scalars collected from a ≤1-row filter (the
  dsir_select scalar-quantile pattern);
- the +1 remainder set is orderBy(host).limit(r) — Spark's
  TakeOrderedAndProject (per-partition heap + driver merge), never a
  global sort — and rides back on a broadcast semi-join;
- the grant itself is a pure map expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FAIR_BUDGET = 495


def fair_budget(
    hosts: DataFrame,
    budget: int = FAIR_BUDGET,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """(host, demand, granted, water_level): max-min fair integer
    grants with Σ granted = min(budget, Σ demand). Deterministic —
    remainder +1s go to the lexicographically-first hosts above the
    water level."""
    lv = hosts.groupBy(F.col(demand_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # ordered pass over DISTINCT demand levels only (see module doc)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = hosts.agg(
        F.count(F.lit(1)).alias("n"), F.sum(demand_col).alias("td")
    )
    s = (
        lv.withColumn("below", F.sum(F.col("v") * F.col("cnt")).over(w))
        .withColumn("cumcnt", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn("above_cnt", F.col("n") - F.col("cumcnt"))
        .withColumn(
            "sv", F.col("below") + F.col("v") * F.col("above_cnt")
        )
    )
    best = (
        s.where(F.col("sv") <= budget)
        .orderBy(F.desc("v"))
        .limit(1)
        .select("v", "sv", "above_cnt")
        .collect()
    )
    if best:
        v0, s0, ac = best[0][0], best[0][1], best[0][2]
    else:  # budget below even θ=min level: water starts at 0
        v0, s0, ac = 0, 0, tot.collect()[0][0]
    if ac and ac > 0:
        theta = v0 + (budget - s0) // ac
        r = (budget - s0) % ac
    else:  # budget covers total demand — everyone gets d in full
        theta, r = v0, 0
    bonus = (
        hosts.where(F.col(demand_col) > theta)
        .select(host_col)
        .orderBy(host_col)
        .limit(int(r))
        .withColumn("_plus", F.lit(1))
    )
    return (
        hosts.join(F.broadcast(bonus), host_col, "left")
        .select(
            host_col,
            F.col(demand_col).alias("demand"),
            (
                F.least(F.col(demand_col), F.lit(theta))
                + F.coalesce(F.col("_plus"), F.lit(0))
            )
            .cast("long")
            .alias("granted"),
            F.lit(theta).cast("long").alias("water_level"),
        )
    )


SHARD_COUNT = 8


def serpentine_shard_plan(
    hosts: DataFrame,
    shards: int = SHARD_COUNT,
    host_col: str = "host",
    load_col: str = "load",
) -> DataFrame:
    """Host → fetcher-shard assignment balanced by expected load:
    (shard, n_hosts, total_load, load_pm, max_host_load).

    A fleet crawler partitions hosts across fetcher shards (a host must
    stay on ONE shard for politeness state); hash partitioning balances
    host COUNTS but not load — one mega-host lands wherever its hash
    says and that shard runs long (exactly the skew the frontier's
    salting exists for, but fetch affinity forbids splitting a host).
    Sorted-serpentine assignment is the deterministic, fully-declarative
    longest-processing-time stand-in (Graham 1969's LPT needs a
    sequential least-loaded-bin scan; boustrophedon placement over the
    load-sorted host list gets within one pass-width of it and is a
    plain window + map expression — the same snake draft used in
    parallel-machine scheduling literature): rank hosts by (load desc,
    host), walk shards 0..K-1 then K-1..0, repeat.

    Scale shape: one partial-agg per-host load rollup happens UPSTREAM
    (the input here is already (host, load)); the rank over |hosts|
    rows (~10^8 — bounded by host count, not the 10^10 URL count) is
    DISTRIBUTED (operators/rankdist.distributed_rank: range exchange +
    per-partition row_number + broadcast offsets) — a single
    unpartitioned window task sorting 10^8 hosts would be a multi-GB
    serialization point; the serpentine expression and the final K-row
    rollup are pure map + partial agg."""
    from crawler_spark.operators.rankdist import distributed_rank

    ranked = distributed_rank(
        hosts.select(
            F.col(host_col), F.col(load_col).cast("long").alias("load")
        ),
        [F.desc("load"), F.col(host_col)],
        "_r1",
    )
    r = F.col("_r1") - F.lit(1)
    pos = r % F.lit(shards)
    snake = F.when(
        (r / F.lit(shards)).cast("long") % 2 == 0, pos
    ).otherwise(F.lit(shards - 1) - pos)
    assigned = ranked.select(
        F.col(host_col),
        F.col("load"),
        snake.cast("int").alias("shard"),
    )
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("load").alias("total_load"),
        F.max("load").alias("max_host_load"),
    )
    tot = per_shard.agg(F.sum("total_load").alias("_t"))
    return per_shard.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_hosts",
        "total_load",
        F.expr("total_load * 1000 div _t").cast("long").alias("load_pm"),
        "max_host_load",
    )
