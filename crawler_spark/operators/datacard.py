"""Corpus data card: the per-(language, quality) composition report.

Every serious training-data release ships a composition table ("data
card" — Gebru et al., "Datasheets for Datasets", CACM 2021; the
Pile/C4/RefinedWeb papers all lead with one): how many documents and
tokens each language × quality cell contributes, as shares of the
corpus. This operator composes the engine's existing JVM-side text
primitives (functions/textstats.py: marker lang-ID, integer quality
bucketing, BPE-ish token count) into that one report.

Reference counterpart: the reference's stats rollups stop at
count-by-confidence/TLD (src/crawler.py:231-252); a composition card
over language × quality is part of the beyond-the-reference
LLM-pipeline surface the brief asks for.

Scale shape: ONE partial-agg pass over the corpus (map-side combine
collapses to ≤ |langs|·3 cells), then a 1-row broadcast total for the
per-mille shares — no second scan, no window, no Python. All counters
exact int64; shares are integer per-mille (div), so the DuckDB twin is
row-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import (
    bpe_token_count,
    lang_id,
    quality_features,
)


def corpus_data_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, quality_bucket, n_docs, n_tokens, docs_pm, tokens_pm,
    avg_words) — corpus composition by language × quality bucket."""
    text = F.col(text_col)
    q = quality_features(text)
    d = docs.select(
        lang_id(text).alias("lang"),
        q["quality_bucket"].alias("quality_bucket"),
        q["n_words"].alias("n_words"),
        bpe_token_count(text).alias("n_tok"),
    )
    cells = d.groupBy("lang", "quality_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_words").alias("sum_words"),
    )
    totals = cells.agg(
        F.sum("n_docs").alias("_td"), F.sum("n_tokens").alias("_tt")
    )
    return (
        cells.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "quality_bucket",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr("n_docs * 1000 div _td").cast("long").alias("docs_pm"),
            F.expr("n_tokens * 1000 div _tt").cast("long").alias("tokens_pm"),
            F.expr("sum_words div n_docs").cast("long").alias("avg_words"),
        )
    )
