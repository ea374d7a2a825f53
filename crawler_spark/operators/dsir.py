"""DSIR-shaped data selection: hashed-n-gram importance scores of raw
web documents against a small target corpus.

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public) selects pretraining data by (1)
fitting bag-of-hashed-n-gram models over a small TARGET corpus (the
distribution you want) and the big RAW pool, (2) scoring every raw
document by its importance weight p_target/q_raw under those models,
(3) resampling proportionally to the weights.

This module keeps the pipeline shape and replaces the log-likelihood
arithmetic with the engine's exact-integer house style (floats/logs
break cross-engine bit-parity):

    bucket(b)    = h64(bigram) mod DSIR_BUCKETS          (hashed feature)
    weight(b)    = (t[b]+1) * DSIR_SCALE div (r[b]+1)    (Laplace-smoothed
                   per-bucket target/raw ratio; the constant corpus-size
                   normalization T/R is dropped — it scales every
                   document identically, so ranking and any fixed cut
                   are unchanged)
    score(doc)   = sum over the doc's bigram OCCURRENCES of weight
                   div n_bigrams
    kept(doc)    = score >= corpus score quantile DSIR_KEEP_Q (the
                   deterministic analogue of resampling: keep the
                   top-(1-q) importance mass; a seeded proportional
                   sample would draw u = h64(seed:doc) and keep
                   u mod M < f(score)). The cut is RELATIVE because the
                   smoothed ratio's absolute scale moves with corpus
                   size — an absolute frozen cut would keep everything
                   at one SF and nothing at 10×.

Scale shape (the reason this beats a per-bigram model join at 100 TB):
- the target flag rides through the bigram explode, so the model is
  ONE groupBy(bucket) with a conditional sum — a 4096-key partial
  aggregate; map-side combine collapses every task to ≤4096 rows
  before the shuffle, and there is NO doc-level join to tag rows;
- the weight table is 4096 rows → BROADCAST onto the occurrence stream
  (map-side hash join, the corpus is never shuffled by feature — unlike
  a raw-bigram model join, whose Zipfian key space moves with the
  corpus);
- the per-doc rollup is the only corpus-sized shuffle, and it is a
  partial agg keyed on doc_id (uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64

DSIR_BUCKETS = 4096  # hashed-feature space (DSIR uses 10^4-10^7)
DSIR_SCALE = 1_000_000  # fixed-point for the per-bucket ratio
DSIR_KEEP_Q = 0.75  # keep docs above this corpus score quantile


def _bucketed_bigrams(docs: DataFrame, is_target) -> DataFrame:
    """(doc_id, _t, bucket) — one row per bigram occurrence, the target
    flag carried through the explode (no doc-level join later)."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        is_target.alias("_t"),
        F.split("text", " ").alias("w"),
    ).where(F.size("w") >= 2)
    return d.select(
        "doc_id",
        "_t",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> concat(w[i-1], ' ', w[i]))"
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "_t",
        F.pmod(h64(F.col("bg")), F.lit(DSIR_BUCKETS)).alias("bucket"),
    )


def dsir_scores(
    docs: DataFrame,
    target_source: str = "src0",
) -> DataFrame:
    """(doc_id, n_bigrams, dsir_score): hashed-bigram importance of
    every document against the ``target_source`` slice.

    ``docs`` needs (doc_id, source, text); the target slice stays in
    the raw pool (it is part of what gets selected, as in DSIR where
    raw is the crawl and target is e.g. Wikipedia).
    """
    bg = _bucketed_bigrams(docs, F.col("source") == target_source)
    weights = (
        bg.groupBy("bucket")
        .agg(
            F.sum(F.col("_t").cast("long")).alias("t"),
            F.count(F.lit(1)).alias("r"),
        )
        .select("bucket", F.expr(f"(t + 1) * {DSIR_SCALE} div (r + 1)").alias("w"))
    )
    per_doc = (
        bg.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("w").alias("_raw"),
        )
    )
    score = F.expr("_raw div n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        score.alias("dsir_score"),
    )


def dsir_select(
    docs: DataFrame,
    target_source: str = "src0",
    keep_q: float = DSIR_KEEP_Q,
) -> DataFrame:
    """(doc_id, n_bigrams, dsir_score, kept): scores plus the selection
    verdict at the exact ``keep_q`` corpus quantile.

    Two-pass like CCNet: the cut is ONE scalar aggregate over the
    scores (exact linear-interpolation percentile — bit-identical to
    DuckDB ``quantile_cont``, the same parity latency_quantiles
    proves), read on the driver and folded in as a literal — no
    per-row scalar subquery, no single-partition window. Past ~10^9
    docs swap in ``percentile_approx`` with the same schema.
    """
    # persist: the quantile agg EXECUTES the whole 3-pass scoring
    # pipeline; without the cache the returned frame recomputes it all
    scored = dsir_scores(docs, target_source).persist()
    cut = scored.agg(
        F.expr(f"percentile(dsir_score, {keep_q!r})").alias("cut")
    ).collect()[0]["cut"]
    return scored.withColumn("kept", F.col("dsir_score") >= F.lit(cut))
