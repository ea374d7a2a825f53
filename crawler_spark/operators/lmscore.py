"""Corpus-LM familiarity scoring: CCNet-style quality bucketing.

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020 — public) buckets web documents
into head/middle/tail by language-model perplexity and keeps the head.
The essential pipeline shape is two-pass: (1) estimate model statistics
over a reference corpus, (2) score every document against them and cut
at fixed quantile thresholds.

This module implements that shape with a corpus-trained **word-bigram
familiarity** score instead of a KenLM perplexity (no external model in
this environment, and floats/logs would break cross-engine bit-parity):

    fam(doc) = sum over bigrams b of min(count(b), CAP) div n_bigrams

Familiar word sequences (frequent in the corpus) score high; rare or
garbled ones low. ``CAP`` bounds any single bigram's vote so one
boilerplate phrase cannot dominate (same role as probability clipping).
All integer — exact, order-independent, oracle-identical.

Scale shape (the part that matters at 100 TB):
- pass 1 is explode → partial-agg groupBy(bigram): map-side combine
  collapses the Zipfian head before the shuffle;
- pass 2 joins doc bigrams to the count table on bigram — shuffle on a
  Zipfian key, but the model side is one row per bigram (no group
  skew), and a production run would prune the model to the top-k
  bigrams and broadcast it (the CCNet pattern: the LM is small, the
  corpus is big); the per-doc rollup is another partial agg;
- thresholds are FIXED constants (as in CCNet, where the quantile cuts
  are computed once per language and frozen), so scoring is a single
  deterministic pass — no global sort, no percentile job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_COUNT_CAP = 1_000  # per-bigram vote cap
LM_HEAD_MIN = 32  # fam-per-bigram thresholds (corpus-frozen, like
LM_TAIL_MAX = 28  # CCNet's per-language quantile cuts)


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bigram) — one row per position (not distinct: frequency
    weighting is the point)."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split("text", " ").alias("w"),
    ).where(F.size("w") >= 2)
    return d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")
        ).alias("bg"),
    )


def lm_familiarity(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, familiarity, bucket) — two-pass corpus-LM
    scoring; bucket ∈ head|middle|tail by frozen thresholds on the
    per-bigram familiarity."""
    bg = _bigrams(docs)
    model = bg.groupBy("bg").agg(
        F.least(F.count(F.lit(1)), F.lit(LM_COUNT_CAP).cast("long")).alias("c")
    )
    per_doc = (
        bg.join(model, "bg")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("c").alias("raw"))
    )
    fam = F.expr("raw div n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        fam.alias("familiarity"),
        F.when(fam >= LM_HEAD_MIN, "head")
        .when(fam <= LM_TAIL_MAX, "tail")
        .otherwise("middle")
        .alias("bucket"),
    )
