"""Count-min sketch: bounded-memory frequency estimation + heavy hitters.

A crawler at 10^10 URLs cannot keep an exact per-host (or per-user,
per-template) frequency map; the count-min sketch (Cormode &
Muthukrishnan 2005) answers "how often has this key appeared?" in
d×w integers with a one-sided (over-count only) error bound. The
reference keeps its counters as exact in-memory dicts
(src/crawler.py's per-domain stats), which is exactly what stops
scaling; this operator is the distributed replacement (SURVEY §2.11).

Everything is exact-integer + portable md5 hashing (texthash.h64), so
the DuckDB twin reproduces the sketch COUNTER-FOR-COUNTER — the driver
gate checks the estimates bit-identically, not just statistically.

Scale shape:
- building the sketch is one explode (×d, a small constant) into a
  partial-agg groupBy on (row, col) — at most d×w output rows
  regardless of input size, the whole point of the sketch; map-side
  combine collapses each partition to ≤ d×w rows before the shuffle;
- the query side joins probe keys to the d×w sketch on (row, col) —
  the sketch side always broadcasts (d×w ≈ 4k rows);
- the exact column in `cms_heavy_hitters` is the SELF-EVALUATION side
  (same convention as ann_recall / lsh_quality): it exists to measure
  the sketch's over-count and would run on a key sample — or not at
  all — at production scale; the sketch itself never needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64_seeded

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_SEED_BASE = 100  # offset so the row-hash family never aliases the
# MinHash permutation family (both derive from h64_seeded)
HH_TOPK = 20


def _cms_cols(key: Column, depth: int, width: int) -> Column:
    """Array of (row, col) sketch coordinates for one key occurrence."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (h64_seeded(key, CMS_SEED_BASE + j) % width).alias("col"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    keyed: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, col, c): the d×w counter table — ≤ depth*width rows total,
    whatever the input size."""
    return (
        keyed.select(
            F.explode(_cms_cols(F.col(key_col), depth, width)).alias("rc")
        )
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est): point-query the sketch for each distinct input key —
    est = min over the d rows, the classic CMS read. The sketch side
    broadcasts (≤ d×w rows)."""
    probes = keys.select(key_col).distinct().select(
        key_col,
        F.explode(_cms_cols(F.col(key_col), depth, width)).alias("rc"),
    ).select(key_col, "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )


def cms_heavy_hitters(
    events: DataFrame,
    k: int = HH_TOPK,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est, exact, overcount): top-k heaviest user_ids by sketch
    estimate with the exact count alongside as self-evaluation
    (overcount = est - exact ≥ 0 always — the CMS one-sided bound).
    Total order: (est desc, key asc), so the limit is deterministic."""
    keyed = events.select(F.col("user_id").cast("string").alias("key"))
    sketch = cms_build(keyed, depth=depth, width=width)
    est = cms_estimate(keyed, sketch, depth=depth, width=width)
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    return (
        est.join(exact, "key")
        .withColumn("overcount", F.col("est") - F.col("exact"))
        .orderBy(F.desc("est"), F.asc("key"))
        .limit(k)
    )
