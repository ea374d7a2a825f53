"""Corpus-level text cleaning for the training-data pipeline tier.

Two standard web-curation operators the pair/cluster dedup family does
not cover (both from published pipeline designs — CCNet, RefinedWeb,
Gopher/MassiveText):

- **Boilerplate line removal**: lines that recur across many DISTINCT
  documents (nav bars, cookie banners, footers) are stripped from every
  document. Needs a global line-frequency pass — an operator, not a
  per-row function.
- **Repetition stats**: within-document repetition measures (duplicate
  line fraction, top 2-gram fraction) used as a quality gate for
  machine-generated / spammy pages.

Everything is built-in DataFrame ops (JVM-side, partial-agg friendly);
no Python UDFs. The synthetic `documents` table has no newlines, so the
driver queries segment the word stream into fixed 10-word lines first —
same plumbing, deterministic, SQL-expressible for the DuckDB oracle.

Scale notes (100 TB):
- line counts are a (line, doc) distinct + groupBy count — the same
  two-shuffle shape as the shingle posting lists in textdedup; the hot
  (boilerplate) set is Zipf-small and is BROADCAST into the anti-join,
  so the corpus is never shuffled by line.
- document reassembly is collect_list bounded by single-document size
  (the same bound any per-doc operation already has), sorted by line
  position for determinism — never a window over the corpus.
- repetition stats are two-level aggregates (doc×gram partial agg, then
  doc rollup): map-side combine does most of the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A line is boilerplate when it occurs in >= this many distinct docs.
BOILERPLATE_MIN_DOCS = 3
# Driver-query segmentation: fixed word count per synthetic "line".
SEGMENT_WORDS = 10
# Gopher-style repetition gates (per-mille).
DUP_LINE_PM_MAX = 300
TOP_2GRAM_PM_MAX = 200


def word_segments(text: Column, k: int = SEGMENT_WORDS) -> Column:
    """Split the space-delimited word stream into k-word segment strings
    (last segment may be short). Pure HOF — no UDF."""
    w = F.split(text, " ")
    n_seg = F.ceil(F.size(w) / F.lit(k)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
    )


def doc_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segments: bool = False,
) -> DataFrame:
    """(id, pos, line) — one row per line, position-preserving.
    segments=True uses fixed word segmentation instead of '\\n' (for
    corpora without newlines, e.g. the synthetic documents table)."""
    arr = (
        word_segments(F.col(text_col))
        if segments
        else F.split(F.col(text_col), "\n")
    )
    return df.select(F.col(id_col), F.posexplode(arr).alias("pos", "line"))


def boilerplate_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = BOILERPLATE_MIN_DOCS,
) -> DataFrame:
    """(line, n_docs) for lines in >= min_docs distinct documents.
    Exact distinct via (line, id) dedupe then count — both shuffles key
    on the line, partial-agg friendly; no count-distinct expand."""
    return (
        lines.select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = BOILERPLATE_MIN_DOCS,
    segments: bool = False,
    joiner: str | None = None,
) -> DataFrame:
    """(id, clean_text, n_lines, n_removed): every document with its
    cross-corpus boilerplate lines stripped (order preserved; a fully-
    boilerplate doc keeps an empty clean_text). joiner defaults to the
    split delimiter ('\\n', or ' ' for segment mode)."""
    if joiner is None:
        joiner = " " if segments else "\n"
    lines = doc_lines(df, id_col, text_col, segments=segments)
    hot = boilerplate_lines(lines, id_col, min_docs).select("line")
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segments: bool = False,
    dup_line_pm_max: int = DUP_LINE_PM_MAX,
    top_2gram_pm_max: int = TOP_2GRAM_PM_MAX,
) -> DataFrame:
    """(id, n_lines, dup_line_pm, top_2gram_pm, is_repetitive) — the
    Gopher/MassiveText within-document repetition gates, integer
    per-mille (float-hash-safe for the oracle gate).

    dup_line_pm: share of lines that are repeats of an earlier line.
    top_2gram_pm: share of all word 2-grams taken by the most frequent
    one (only the max COUNT is needed, so gram ties cannot affect the
    result)."""
    lines = doc_lines(df, id_col, text_col, segments=segments)
    line_stats = (
        lines.groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_lines"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            id_col,
            "n_lines",
            F.floor((F.col("n_lines") - F.col("n_distinct")) * 1000 / F.col("n_lines"))
            .cast("long")
            .alias("dup_line_pm"),
        )
    )
    w = F.split(F.col(text_col), " ")
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.concat(
                        F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("ng"),
    )
    gram_stats = (
        grams.groupBy(id_col, "ng")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max(F.col("c")).alias("top_c"),
            F.sum("c").alias("total"),
        )
        .select(
            id_col,
            F.floor(F.col("top_c") * 1000 / F.col("total"))
            .cast("long")
            .alias("top_2gram_pm"),
        )
    )
    return (
        line_stats.join(gram_stats, id_col, "left")
        .select(
            id_col,
            "n_lines",
            "dup_line_pm",
            F.coalesce("top_2gram_pm", F.lit(0)).alias("top_2gram_pm"),
            (
                (F.col("dup_line_pm") > dup_line_pm_max)
                | (F.coalesce("top_2gram_pm", F.lit(0)) > top_2gram_pm_max)
            ).alias("is_repetitive"),
        )
    )
