"""Deterministic corpus sampling / rebalancing for the pipeline tier.

Training corpora are rebalanced by downsampling over-represented strata
(language, source domain, quality bucket — CCNet and the Pile both ship
per-stratum weights). Requirements at 100 TB:

- **Deterministic & reproducible**: membership is a pure function of
  (id, salt), so re-runs, retries, and incremental appends agree —
  ``rand()`` cannot do that. We map the repo-portable ``h64`` into
  [0, 1000) and keep rows under the stratum's per-mille rate.
- **Zero shuffle**: rate tables are Zipf-small (languages, domains), so
  they ride along as a literal ``CASE`` map — the filter is map-side,
  prunable, and whole-stage-codegen'd. (For genuinely large rate
  tables, broadcast-join the rates instead; same semantics.)
- **Auditable**: ``sample_report`` emits per-stratum achieved rates
  plus order-insensitive id checksums (sum/xor) so an oracle can
  confirm the exact membership set without hauling the rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import (
    h64,
    hex_prefix_value,
    seeded_md5_key,
)

DEFAULT_RATE_PM = 1000
# Driver-query rebalance: downsample the over-represented 'en' stratum.
BALANCE_RATES_PM = {"en": 300}
SAMPLE_SALT = "bal1"


def sample_bucket(id_col: Column, salt: str = SAMPLE_SALT) -> Column:
    """Deterministic bucket in [0, 1000) from (id, salt)."""
    return h64(F.concat(id_col.cast("string"), F.lit("|" + salt))) % 1000


def stratum_rate_pm(
    strata_col: Column,
    rates: dict[str, int],
    default_pm: int = DEFAULT_RATE_PM,
) -> Column:
    out: Column = F.lit(default_pm)
    for k, v in sorted(rates.items()):
        out = F.when(strata_col == k, F.lit(v)).otherwise(out)
    return out


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = SAMPLE_SALT,
    default_pm: int = DEFAULT_RATE_PM,
) -> DataFrame:
    """Rows whose hash bucket falls under their stratum's rate."""
    return df.where(
        sample_bucket(F.col(id_col), salt)
        < stratum_rate_pm(F.col(strata_col), rates, default_pm)
    )


# --------------------------------------------------- priority sampling --
#
# Weighted without-replacement sampling with an unbiased subset-sum
# estimator — Duffield, Lund & Thorup, "Priority sampling" (JACM 2007).
# The quality-weighted selection shape: keep k documents where heavy
# (high-quality / long) docs are proportionally likelier, yet any
# weight-sum over the sample can still be estimated without bias via
# est_i = max(w_i, τ) (τ = the (k+1)-th priority).
#
# Portability: the classic scheme draws u ~ U(0,1] and ranks by w/u.
# RNG and float division are replaced the repo-standard way — u comes
# from the portable seeded-md5 family (uniform integer in [1, 16^6]),
# and the priority is kept in exact int64 per-mille:
#
#     priority_pm = (w · 16^6 · 1000) div u      ≈ 1000 · w/u'
#
# (div ≡ DuckDB // on non-negative operands). No float ever crosses an
# engine boundary; ties are broken by id, so the sample is a total
# order. int64 headroom: w · 1.6777e10 < 2^63 for w < 5.5e8 — any
# larger weight unit should drop the ×1000.
#
# Scale shape: one map pass computes priorities, then
# orderBy(...).limit(k+1) is Spark's TakeOrderedAndProject — a
# per-partition k+1 heap + driver merge, never a global sort. τ is a
# 1-row broadcast. This is exactly the distributed form the paper
# recommends (priorities are independent per row).

PRIORITY_SAMPLE_K = 10
PRIORITY_SEED = "ps1"
_PRI_SCALE = 16**6 * 1000  # 16777216000


def priority_sample(
    df: DataFrame,
    k: int = PRIORITY_SAMPLE_K,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = PRIORITY_SEED,
) -> DataFrame:
    """(id, weight, priority_pm, est_w_pm): a k-row priority sample.
    est_w_pm = max(w, τ)·1000-scaled — summing it over any subset of
    the sample unbiasedly estimates that subset's true weight sum.
    If the population has ≤ k rows, all rows return with exact
    est_w_pm = w·1000 (τ = 0), per the paper's degenerate case."""
    u = hex_prefix_value(seeded_md5_key(seed, F.col(id_col)), 6) + 1
    pri = (
        df.select(F.col(id_col), F.col(weight_col).alias("weight"))
        .withColumn("_u", u)
        .withColumn("priority_pm", F.expr(f"weight * {_PRI_SCALE} div _u"))
        .drop("_u")
    )
    topk1 = pri.orderBy(F.desc("priority_pm"), F.asc(id_col)).limit(k + 1)
    tau = topk1.agg(
        F.when(F.count(F.lit(1)) > k, F.min("priority_pm"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("tau_pm")
    )
    return (
        topk1.orderBy(F.desc("priority_pm"), F.asc(id_col))
        .limit(k)
        .crossJoin(F.broadcast(tau))
        .withColumn(
            "est_w_pm", F.greatest(F.col("weight") * 1000, F.col("tau_pm"))
        )
        .select(id_col, "weight", "priority_pm", "est_w_pm")
    )


def sample_report(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = SAMPLE_SALT,
    default_pm: int = DEFAULT_RATE_PM,
) -> DataFrame:
    """Per-stratum audit: totals, sampled counts, achieved per-mille,
    and sum/xor id checksums of the sampled membership set."""
    sampled = sample_bucket(F.col(id_col), salt) < stratum_rate_pm(
        F.col(strata_col), rates, default_pm
    )
    flagged = df.select(
        F.col(strata_col),
        F.col(id_col),
        F.when(sampled, F.col(id_col)).alias("_sid"),
    )
    return (
        flagged.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("_sid").alias("n_sampled"),
            F.coalesce(F.sum("_sid"), F.lit(0)).cast("long").alias("sum_ids"),
            F.coalesce(F.expr("bit_xor(_sid)"), F.lit(0))
            .cast("long")
            .alias("xor_ids"),
        )
        .withColumn(
            "achieved_pm",
            F.floor(F.col("n_sampled") * 1000 / F.col("n_total")).cast("long"),
        )
    )


# ---------------------------------------------------- leak-free splits --
#
# Train/val/test assignment for a web corpus must be GROUP-aware: near
# duplicates concentrate within a host (templated pages, mirrored
# paths), so hashing doc_ids independently leaks train content into
# eval — the standard fix is to split by group key (host / registrable
# domain) so every group lands wholly in one split (the same reasoning
# as decontamination, operators/decontam.py, but structural). Split
# membership is the repo-standard deterministic hash of (group, salt):
# reproducible, append-stable, cluster-size-invariant.

SPLIT_RATES_PM = (("train", 900), ("val", 50), ("test", 50))
SPLIT_SALT = "split1"


def grouped_split(
    df: DataFrame,
    group_col: str,
    rates_pm=SPLIT_RATES_PM,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """df + ``split`` column: every distinct ``group_col`` value maps
    wholly into one split (cumulative per-mille bands over the group's
    hash bucket) — no row-level leakage across splits by construction."""
    bucket = sample_bucket(F.col(group_col), salt)
    out: Column = F.lit(rates_pm[-1][0])
    hi = 0
    conds = []
    for name, pm in rates_pm[:-1]:
        hi += pm
        conds.append((name, hi))
    for name, edge in reversed(conds):
        out = F.when(bucket < edge, F.lit(name)).otherwise(out)
    return df.withColumn("split", out)


def split_report(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    rates_pm=SPLIT_RATES_PM,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """(split, n_groups, n_docs, sum_chars, achieved_pm): the audit
    rollup — group counts prove the assignment is group-granular, and
    achieved_pm is measured against DOCS (what training actually sees),
    not groups. One partial-agg groupBy; the leak-free property needs
    no runtime check because it holds by construction."""
    s = grouped_split(df, group_col, rates_pm, salt)
    tot = s.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        s.groupBy("split")
        .agg(
            F.countDistinct(group_col).alias("n_groups"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "achieved_pm",
            F.expr("n_docs * 1000 div n_total").cast("long"),
        )
        .select("split", "n_groups", "n_docs", "sum_chars", "achieved_pm")
    )
