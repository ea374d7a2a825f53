"""Per-host politeness budget — the batch reformulation of the reference's
token bucket, with explicit skew splitting.

Reference semantics (src/utils/rate_limiter.py:11-78; config.py:11-12):
a blocking token bucket (rate=2/s, burst=5) paces every request. Against a
materialized corpus, wall-clock pacing is meaningless; the preserved
semantics (SURVEY §2.9) are (a) the *budget* — at most
``burst + rate·round_duration`` URLs admitted per host per round — and
(b) the *ordering* — admission in deterministic (priority, surt) order.
URLs over budget are NOT dropped (a token bucket delays, it does not
reject): they defer to the next round.

Skew: a window over a mega-host (FIXTURES plants one host with ~20% of all
rows) serializes onto one task. Two-phase exact top-k fixes this without
changing the admitted set:

  phase 1 (only when skew detected): salt rows into S subgroups per host,
    take the top-B of each — a row cut here has ≥B rows of its own host
    ranked above it, so it provably cannot be in the host's global top-B;
  phase 2: exact top-B per host over the ≤ S·B survivors.

Per-host budget overrides (robots crawl_delay) ride in as a column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.config import DEFAULT, EngineConfig


@dataclass
class AdmitResult:
    admitted: DataFrame
    deferred: DataFrame


def default_order() -> list[Column]:
    """The deterministic scheduling order contract: (priority desc, surt).

    The reference schedules in seed/stream order (src/crawler.py:103-106);
    priority encodes that (higher = earlier), surt breaks ties.
    """
    return [F.col("priority").desc(), F.col("surt").asc()]


def admit_per_host(
    candidates: DataFrame,
    budget: int | None = None,
    host_col: str = "host",
    order: list[Column] | None = None,
    budget_col: str | None = None,
    cfg: EngineConfig = DEFAULT,
    force_salting: bool | None = None,
    load_observation=None,
) -> AdmitResult:
    """Split candidates into (admitted, deferred) under the per-host budget.

    budget: uniform rows-per-host-per-round cap; defaults to the politeness
        config mapping (burst + rate·round_duration).
    budget_col: optional per-row column with a host-specific budget (e.g.
        derived from robots crawl_delay); overrides ``budget`` where set.
    force_salting: tests can pin phase-1 on/off; default = decide from an
        aggregate count (any host above cfg.skew_threshold).
    load_observation: optional pyspark Observation; receives
        ``max_load`` = the max per-host row count, read off the admission
        window's own row_number (zero extra jobs — the frontier loop uses
        the previous round's value as this round's skew decision).
    """
    order = order or default_order()
    b = budget if budget is not None else cfg.politeness.budget_per_round
    eff_budget = (
        F.coalesce(F.col(budget_col), F.lit(b)) if budget_col else F.lit(b)
    )

    need_salt = force_salting
    if need_salt is None:
        hot = (
            candidates.groupBy(host_col)
            .count()
            .where(F.col("count") > cfg.skew_threshold)
            .limit(1)
            .count()
        )
        need_salt = hot > 0

    df = candidates
    deferred_parts: list[DataFrame] = []

    if need_salt:
        salt = F.pmod(F.xxhash64(F.col("surt"), F.lit(7)), F.lit(cfg.skew_salts))
        w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order)
        df = df.withColumn("_rn1", F.row_number().over(w1))
        if load_observation is not None:
            # Observe the PRE-filter phase-1 load: max subgroup size ×
            # salts ≈ the hottest host's true candidate count (slight
            # over-estimate under hash imbalance — safe direction: salting
            # stays latched while the host is hot). Observing the phase-2
            # window instead would read a value capped at salts·budget,
            # which sits BELOW any threshold > salts·budget and would
            # toggle salting off every other round (the oscillation bug).
            df = df.observe(
                load_observation,
                (F.max("_rn1") * F.lit(cfg.skew_salts)).alias("max_load"),
            )
            load_observation = None
        deferred_parts.append(df.where(F.col("_rn1") > eff_budget).drop("_rn1"))
        df = df.where(F.col("_rn1") <= eff_budget).drop("_rn1")

    w2 = Window.partitionBy(host_col).orderBy(*order)
    df = df.withColumn("_rn2", F.row_number().over(w2))
    if load_observation is not None:
        # unsalted path: _rn2 max pre-filter IS the hottest host's load
        df = df.observe(load_observation, F.max("_rn2").alias("max_load"))
    admitted = df.where(F.col("_rn2") <= eff_budget).drop("_rn2")
    deferred_parts.append(df.where(F.col("_rn2") > eff_budget).drop("_rn2"))

    deferred = deferred_parts[0]
    for p in deferred_parts[1:]:
        deferred = deferred.unionByName(p)
    return AdmitResult(admitted=admitted, deferred=deferred)


def schedule_fetches(
    admitted: DataFrame,
    round_start_ms: int = 0,
    host_col: str = "host",
    order: list[Column] | None = None,
    delay_col: str = "crawl_delay",
    default_delay_s: float = 0.5,
) -> DataFrame:
    """Per-host dispatch timetable: the k-th admitted URL of a host
    (deterministic ``default_order``) fetches at
    ``round_start + k · crawl_delay``.

    This is the explicit-timestamp form of the reference's blocking
    token bucket (src/utils/rate_limiter.py:11-78): instead of pacing
    by sleeping, the round's admitted set is compiled into a timetable
    a fetcher fleet consumes — each executor walks its host partition
    in slot order and honors ``scheduled_ms``. One window per host,
    the SAME (host)-partitioning admit_per_host just shuffled by, so
    under one stage boundary the exchange is reused; groups are
    budget-capped (≤ per-round budget rows), so no skew.

    ``delay_col`` (seconds, from robots crawl_delay) may be NULL →
    ``default_delay_s``. ``delay_ms`` truncates toward zero, matching
    the SQL CAST the oracle uses.
    """
    order = order or default_order()
    w = Window.partitionBy(host_col).orderBy(*order)
    delay_ms = (
        (F.coalesce(F.col(delay_col), F.lit(default_delay_s)) * 1000)
        .cast("bigint")
    )
    slot = (F.row_number().over(w) - 1).cast("long")
    return admitted.withColumn("slot", slot).withColumn(
        "scheduled_ms",
        (F.lit(int(round_start_ms)) + F.col("slot") * delay_ms).cast("long"),
    )


def adaptive_budget(base_rate: float, failures_prev: int, successes_prev: int, cfg: EngineConfig = DEFAULT) -> float:
    """Next round's rate from the previous round's outcome — the
    deterministic recast of AdaptiveRateLimiter
    (src/utils/rate_limiter.py:184-207): any failure halves the rate
    (floor min_rate); a fully-successful round with ≥ success_threshold
    completions raises it ×increase_factor (cap max_rate)."""
    a = cfg.adaptive
    if failures_prev > 0:
        return max(a.min_rate, base_rate * a.decrease_factor)
    if successes_prev >= a.success_threshold:
        return min(a.max_rate, base_rate * a.increase_factor)
    return base_rate
