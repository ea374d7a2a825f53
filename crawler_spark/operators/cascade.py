"""The full dedup cascade as ONE composed query — raw → exact →
quality-aware near-dup.

Every published pretraining pipeline runs this exact sequence (C4,
Raffel et al. 2020; RefinedWeb, Penedo et al. 2023; FineWeb 2024 —
all public): exact dedup first (cheap hash pass collapses byte
duplicates, which are the bulk), then MinHash-LSH near-dup clustering
over the survivors, keeping the best-quality copy per cluster. The
individual stages exist in this engine as separate oracled operators
(textdedup.dedup_exact, minhash_lsh_pairs, components.dedup_clusters,
components.cluster_keep_best); this composition proves they chain the
way a user would actually run them and reports the per-stage
survivor ledger — the removal-rate table every dataset release
publishes.

Scale shape: the cascade ORDER is the scale strategy — exact dedup
(one 16-byte-key shuffle) shrinks the input to the expensive LSH
stage, and clustering runs only on exact-survivors; every stage is
the already-audited plan of its standalone operator. Stage ledger
aggregates are one partial agg each over semi-joined survivor sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions import textstats as TS
from crawler_spark.operators.components import cluster_keep_best, dedup_clusters
from crawler_spark.operators.textdedup import dedup_exact, minhash_lsh_pairs


def _stage_row(docs: DataFrame, stage: str) -> DataFrame:
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    ).select(F.lit(stage).alias("stage"), "n_docs", "n_tokens")


# Planted byte-exact duplicates for the driver query: the testdata
# documents table has no byte-identical rows, so the cascade input
# re-adds every 25th document under an offset id — the exact stage
# must collapse them (min-id first-wins keeps the original).
DUP_OFFSET = 2_000_000_000
DUP_MOD = 25


def cascade_input(docs: DataFrame) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    dups = d.where(F.col("doc_id") % DUP_MOD == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text"
    )
    return d.unionByName(dups)


def dedup_cascade(docs: DataFrame) -> DataFrame:
    """(stage, n_docs, n_tokens) for stage ∈ raw / exact /
    neardup_keep_best — the survivor ledger of the standard cascade."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    kept1 = dedup_exact(d).select("doc_id")
    d1 = d.join(kept1, "doc_id", "left_semi")
    clusters = dedup_clusters(d1, minhash_lsh_pairs(d1))
    q = d1.select(
        "doc_id",
        TS.quality_features(F.col("text"))["quality_score_pm"].alias("quality_pm"),
    )
    kept2 = (
        cluster_keep_best(q, clusters)
        .where(F.col("is_kept"))
        .select("doc_id")
    )
    d2 = d1.join(kept2, "doc_id", "left_semi")
    return (
        _stage_row(d, "raw")
        .unionByName(_stage_row(d1, "exact"))
        .unionByName(_stage_row(d2, "neardup_keep_best"))
    )
