"""HyperLogLog distinct-count sketch in exact portable integer math.

The cardinality companion to the count-min sketch
(operators/sketches.py): a crawler at 10^10 URLs needs "how many
DISTINCT users/URLs/digests per group?" without a per-group exact
distinct (whose state is O(distinct), the thing being avoided). The
HyperLogLog register table (Flajolet et al. 2007) answers it in m
small integers per group with ~1.04/sqrt(m) relative error. The
reference's counters are exact in-memory sets (src/crawler.py's
per-domain stats), which is exactly what stops scaling; this is the
distributed bounded-memory replacement (beyond-reference, SURVEY
§2.11).

Portability contract (the driver gate checks values bit-identically,
not statistically): every step is exact int64 —

- hash: ``h = h64('hll:' || key)`` (60-bit md5 prefix, the engine-wide
  portable hash family);
- register index ``h % m``, remaining value ``v = h div m`` (52 bits);
- rank ``rho = 53 - bitlen(v)`` via ``length(bin(v))`` (``bin`` prints
  the same minimal binary string in both engines; v = 0 ⇒ 53), capped
  at ``HLL_RHO_CAP`` so the power-of-two sum below stays in int64;
- the harmonic-mean denominator scaled by 2^cap:
  ``S = sum_b 2^(cap - rho_b)`` with absent registers contributing
  ``2^cap`` each — a pure integer shift-left sum;
- raw estimate ``est = (ALPHA_PM * m^2 * 2^cap) div (1000 * S)`` — one
  int64 division with alpha truncated to per-mille;
- the standard small-range correction (raw ≤ 2.5m with empty
  registers ⇒ linear counting ``m * ln(m/V)``) needs ``ln``, which is
  NOT portably bit-identical — so ``LC_TABLE`` precomputes
  ``round(m * ln(m/V))`` for every possible empty-register count V
  (just m entries) as module-constant integers both engines index as
  a literal array. Floats never cross an engine boundary.

The exact distinct count rides along as the self-evaluation column,
same convention as cms_heavy_hitters' overcount.

Scale shape (100 TB):
- per-occurrence work (hash, index, rank) is whole-stage-codegen JVM;
- ``groupBy(key, bucket).max(rho)`` is a partial agg whose output is
  ≤ m rows per group REGARDLESS of input size — the entire point;
  map-side combine collapses each partition to the register table
  before the shuffle;
- the per-group fold is a second partial agg over ≤ m rows/group;
- registers merge by max, so sharded sketches union with one more
  ``max`` — incremental/streaming-friendly for free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64

HLL_M = 256  # registers per group; rel. error ~ 1.04/sqrt(256) = 6.5%
HLL_RHO_CAP = 30  # keeps S = sum(2^(cap-rho)) <= m * 2^cap well in int64
# alpha_256 = 0.7213/(1 + 1.079/256) = 0.71827…, truncated to per-mille
HLL_ALPHA_PM = 718
# linear-counting lookup: LC_TABLE[V-1] = round(m * ln(m / V)) for
# V = 1..m empty registers — floats evaluated HERE once, both engines
# consume the identical integer literals
LC_TABLE = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]
LC_RAW_MAX = (5 * HLL_M) // 2  # apply linear counting iff raw est ≤ 2.5m


def hll_registers(
    keyed: DataFrame,
    group_col: str = "key",
    value_col: str = "value",
    m: int = HLL_M,
) -> DataFrame:
    """(group, bucket, rho): the per-group register table — ≤ m rows per
    group whatever the input size. Registers from independent shards
    merge by a further ``max(rho)``."""
    h = h64(F.concat(F.lit("hll:"), F.col(value_col).cast("string")))
    v = F.expr(f"_h div {m}")
    rho = F.least(
        F.when(v == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(v))),
        F.lit(HLL_RHO_CAP),
    )
    return (
        keyed.select(F.col(group_col).alias("grp"), h.alias("_h"))
        .select("grp", (F.col("_h") % m).alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """(grp, est): fold each group's register table into the HLL
    estimate — raw harmonic estimator, switched to the precomputed
    linear-counting table in the small range (raw ≤ 2.5m with empty
    registers present). Exact integer arithmetic end to end."""
    cap = HLL_RHO_CAP
    numer = HLL_ALPHA_PM * m * m * (1 << cap)  # ~5.05e16, fits int64
    lc = F.array(*[F.lit(x) for x in LC_TABLE])
    folded = registers.groupBy("grp").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {cap} - rho)")
        ).alias("_sp"),
        F.count(F.lit(1)).alias("_present"),
    )
    raw = F.expr(
        f"CAST({numer} AS BIGINT) div "
        f"(1000 * (_sp + ({m} - _present) * shiftleft(CAST(1 AS BIGINT), {cap})))"
    )
    zeros = F.lit(m) - F.col("_present")
    return folded.select(
        "grp",
        raw.alias("_raw"),
        zeros.alias("_zeros"),
        lc.alias("_lc"),
    ).select(
        "grp",
        F.when(
            (F.col("_zeros") > 0) & (F.col("_raw") <= LC_RAW_MAX),
            F.element_at("_lc", F.col("_zeros").cast("int")).cast("long"),
        )
        .otherwise(F.col("_raw"))
        .alias("est"),
    )


def hll_distinct_report(
    events: DataFrame,
    m: int = HLL_M,
) -> DataFrame:
    """(key, est, exact, err_pm): distinct user_ids per event_type by
    HLL estimate with the exact distinct count alongside as
    self-evaluation (err_pm = (est - exact) * 1000 div exact — signed
    per-mille error; |err| concentrates near 1040/sqrt(m)). The exact
    side exists to measure the sketch and would run on a group sample —
    or not at all — at production scale; the sketch never needs it."""
    keyed = events.select(
        F.col("event_type").alias("key"),
        F.col("user_id").cast("string").alias("value"),
    )
    est = hll_estimate(hll_registers(keyed, "key", "value", m), m)
    exact = keyed.groupBy("key").agg(
        F.countDistinct("value").alias("exact")
    )
    return (
        est.withColumnRenamed("grp", "key")
        .join(exact, "key")
        .withColumn("err_pm", F.expr("((est - exact) * 1000) div exact"))
        .select("key", "est", "exact", "err_pm")
    )


def hll_union_report(events: DataFrame, m: int = HLL_M) -> DataFrame:
    """One row (scope, merged_est, exact_global, naive_group_sum,
    err_pm): the MERGEABILITY demonstration — per-group register tables
    union into the global sketch by one more max(rho) per bucket, and
    the merged estimate is compared against (a) the exact global
    distinct and (b) the naive sum of per-group exact distincts (the
    overcount a non-mergeable per-group counter would produce). This is
    the property that matters at 100 TB: shard/day/source sketches
    (≤ m ints each) roll up with NO re-scan of the raw stream — the
    exact columns are self-evaluation only."""
    keyed = events.select(
        F.col("event_type").alias("key"),
        F.col("user_id").cast("string").alias("value"),
    )
    per_group = hll_registers(keyed, "key", "value", m)
    merged = (
        per_group.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .withColumn("grp", F.lit("all"))
    )
    est = hll_estimate(merged, m)  # 1 row
    exact = keyed.agg(F.countDistinct("value").alias("exact_global"))
    naive = (
        keyed.groupBy("key")
        .agg(F.countDistinct("value").alias("_d"))
        .agg(F.sum("_d").alias("naive_group_sum"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("grp").alias("scope"),
            F.col("est").alias("merged_est"),
            F.col("exact_global").cast("long").alias("exact_global"),
            F.col("naive_group_sum").cast("long").alias("naive_group_sum"),
            F.expr(
                "((est - exact_global) * 1000) div exact_global"
            ).alias("err_pm"),
        )
    )
