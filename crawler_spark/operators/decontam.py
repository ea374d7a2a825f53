"""Benchmark decontamination for the training-data pipeline tier.

The standard eval-set decontamination pass (GPT-3 Appendix C, PaLM,
Llama): a training document is contaminated when it shares any rolling
word n-gram with a held-out benchmark/eval set. Output is a per-document
contamination report (hit count + per-mille share) so the caller can
drop or redact.

Shape (100 TB):
- Eval sets are tiny relative to the corpus (MBs of benchmark text vs
  TBs of training text), so the distinct eval n-grams are hashed to
  64-bit keys and BROADCAST; the corpus side is one explode + distinct
  + broadcast semi-probe + per-doc aggregate — O(total corpus grams)
  with map-side partial aggregation, zero corpus-side shuffle for the
  probe itself.
- Hashing grams to int64 shrinks the broadcast ~6x vs raw strings; h64
  (md5-prefix) is the repo-wide engine-portable hash, so the DuckDB
  oracle reproduces it bit-exactly (functions/texthash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64
from crawler_spark.functions.textstats import word_ngrams

# Rolling-window length for contamination matching. (GPT-3 used 13 on
# real web text; the synthetic corpus's shared spans are 10-word
# segments, so 8 keeps the driver query meaningfully exercised.)
CONTAM_NGRAM = 8
# Deterministic held-out split for the driver query: doc_id % MOD == REM.
EVAL_MOD = 10
EVAL_REM = 7


def eval_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The held-out rows (deterministic id-mod split — stands in for a
    real benchmark table, which would arrive as its own source)."""
    return df.where(F.col(id_col) % EVAL_MOD == EVAL_REM)


def train_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return df.where(F.col(id_col) % EVAL_MOD != EVAL_REM)


def eval_gram_hashes(
    eval_df: DataFrame, n: int = CONTAM_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(gh) — distinct h64 of every rolling n-gram in the eval set."""
    return (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ng"))
        .select(h64(F.col("ng")).alias("gh"))
        .distinct()
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = CONTAM_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, n_hits, contam_pm, is_contaminated) per training
    document. n_grams counts DISTINCT grams in the doc (so contam_pm is
    a set-overlap share, insensitive to within-doc repetition); docs too
    short for a single n-gram report 0 grams / 0 hits / clean."""
    grams = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ng"),
    ).select(id_col, h64(F.col("ng")).alias("gh")).distinct()
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        grams.join(F.broadcast(eval_gram_hashes(eval_df, n, text_col)), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = train.select(id_col).distinct()
    return (
        base.join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.floor(
                    F.coalesce("n_hits", F.lit(0)) * 1000 / F.col("n_grams")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("contam_pm"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )
