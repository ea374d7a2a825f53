"""Hashed-feature linear quality scorer (the fastText/CCNet filter shape).

Model-based quality filtering — a linear classifier over
hashing-trick bag-of-words features — is the standard web-corpus
curation stage the heuristic `quality_score` and the LM-perplexity
`lm_familiarity` bracket from either side (fastText is the published
tool; GPT-3/CCNet-style pipelines use exactly this shape). The model
here is the INFERENCE plumbing with a deterministic stand-in weight
table: real learned weights drop into the same broadcast join without
touching the plan. The reference has no model tier (beyond-reference,
SURVEY §2.11).

Stand-in weights (portable, exact): ``w_ppm(b) = h64('qw:' || b) %
2001 - 1000`` — pseudo-random per-mille weights in [-1000, 1000]
derived from the shared md5 hash family, so the DuckDB twin generates
the identical table and the driver gate checks scores bit-for-bit.
Feature map: token → bucket ``h64('q:' || token) % B`` (the hashing
trick, B = 4096). Score: mean token weight in exact integer per-mille
(``sum div count``), label = keep iff score ≥ 0.

Scale shape (100 TB):
- token explode → bucket id is pure whole-stage-codegen JVM;
- the weight table is the model artifact: B rows, broadcast-joined —
  no shuffle of the corpus side at any B that fits a real model
  (fastText default 2M buckets ≈ 16 MB, still broadcast range);
- per-doc aggregation is one partial-agg groupBy on doc_id — the only
  shuffle, keyed on the uniform doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64

QL_BUCKETS = 4096
QL_WEIGHT_RANGE = 2001  # w_ppm ∈ [-1000, 1000]


def quality_weights(spark: SparkSession, buckets: int = QL_BUCKETS) -> DataFrame:
    """(bucket, w_ppm): the deterministic stand-in model artifact —
    replace with a learned table of the same schema in production."""
    return spark.range(buckets).select(
        F.col("id").alias("bucket"),
        (
            h64(F.concat(F.lit("qw:"), F.col("id").cast("string")))
            % QL_WEIGHT_RANGE
            - 1000
        ).alias("w_ppm"),
    )


def hashed_quality_scores(
    docs: DataFrame,
    weights: DataFrame,
    buckets: int = QL_BUCKETS,
) -> DataFrame:
    """(doc_id, source, n_tokens, score_ppm, label): mean hashed-token
    weight per document in exact per-mille; label = 'keep' iff
    score_ppm ≥ 0. Docs with zero non-empty tokens drop out (no
    features ⇒ no score), which also keeps the integer division
    denominator nonzero in both engines."""
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("token"),
    ).where(F.col("token") != "")
    feat = toks.withColumn(
        "bucket", h64(F.concat(F.lit("q:"), F.col("token"))) % buckets
    )
    scored = (
        feat.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_ppm").alias("_sw"),
        )
        .withColumn("score_ppm", F.expr("_sw div n_tokens"))
    )
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        "score_ppm",
        F.when(F.col("score_ppm") >= 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
