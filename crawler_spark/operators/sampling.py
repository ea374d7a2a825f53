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

from crawler_spark.functions.texthash import h64

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
