"""Exact duplicated-span removal (substring-level dedup) for the
training-data pipeline tier.

Document-level dedup (exact md5, MinHash/SimHash near-dup, clusters —
:mod:`crawler_spark.operators.textdedup` / :mod:`.components`) keeps or
drops WHOLE documents. Published pipeline analyses (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr dedup) show web corpora also repeat long SPANS inside
otherwise-distinct documents (syndicated paragraphs, quoted licenses,
templated blocks); those are removed by rewriting the documents, not by
dropping them. The reference engine has no counterpart (its dedupe is a
per-URL seen set — SURVEY §2.4); this operator is part of the
LLM-data-pipeline surface built on top.

Semantics (word-window variant of ExactSubstr, deterministic):
- a K-word rolling window is *duplicated* when its hash occurs at >= 2
  (doc, position) occurrences corpus-wide (within-doc repeats count);
- the globally-first occurrence of each duplicated window — minimum
  (doc_id, position) — is the canonical copy and is KEPT;
- every word position covered by any NON-canonical occurrence of a
  duplicated window is removed; documents are rebuilt from the
  surviving words in order (a fully-duplicated doc keeps empty text).

Scale shape (100 TB):
- the only corpus-sized shuffle keys on the 64-bit gram hash — the same
  posting-list shape as the shingle/LSH family in textdedup; the
  duplicate-occurrence group-by is partial-agg friendly (count + min of
  a packed occurrence key);
- covered positions are aggregated to ONE array row per document
  (bounded by document length, like every per-doc op here), so the
  rewrite joins docs←covered on doc_id at one row per side — the word
  stream itself is never shuffled;
- the in-doc rewrite is a JVM higher-order filter. Membership is
  array_contains per word (O(words x covered)); documents are bounded
  (the corpus is wide, not deep), and a sorted-merge rewrite is the
  drop-in if a pathological doc ever matters.

Everything below is built-in DataFrame ops — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64
from crawler_spark.functions.textstats import word_ngrams

# Rolling-window length. The synthetic corpus's cross-doc shared spans
# are 10-word segments, so 8 keeps every shared span detectable (a
# shared 10-word segment yields three 8-grams).
SPAN_NGRAM = 8
# Occurrence key: struct(doc_id, pos). Struct min aggregates are
# partial-agg (map-side combine) exactly like a packed long, lexicographic
# (doc_id, pos) order matches the canonical-copy rule, and — unlike the
# packed ``doc_id * 10^6 + pos`` long this replaced — it cannot silently
# corrupt canonical selection on book-length (>10^6-word) documents.


def span_occurrences(
    df: DataFrame,
    k: int = SPAN_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gh, okey): every rolling k-word window occurrence.
    pos is the 0-based word index where the window starts; okey is the
    global occurrence order struct (doc_id, pos)."""
    d = F.col(id_col).cast("long")
    return df.select(
        d.alias(id_col),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "ng"),
    ).select(
        id_col,
        "pos",
        h64(F.col("ng")).alias("gh"),
        F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p")).alias("okey"),
    )


def duplicated_occurrences(
    occ: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Occurrences of windows seen >= 2 times corpus-wide, minus each
    window's canonical (globally-first) occurrence. One group-by on the
    gram hash (count + min okey — both map-side partial aggs), then an
    equi-join back on the hash."""
    dup = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min("okey").alias("keep_okey"))
        .where(F.col("n_occ") >= 2)
    )
    return (
        occ.join(dup, "gh")
        .where(F.col("okey") != F.col("keep_okey"))
        .select(id_col, "pos")
    )


def remove_duplicated_spans(
    df: DataFrame,
    k: int = SPAN_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_removed, dup_span_pm, clean_md5): every document
    rewritten with non-canonical duplicated spans removed. clean_md5 is
    the md5 of the rebuilt space-joined text (the rebuilt text itself is
    available as ``clean_text`` before the final select — kept hashed
    here so result rows stay small at driver-compare scale)."""
    occ = span_occurrences(df, k, id_col, text_col)
    dup_occ = duplicated_occurrences(occ, id_col)
    cov = (
        dup_occ.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias(
                "wpos"
            ),
        )
        .groupBy(id_col)
        .agg(F.collect_set("wpos").alias("cov"))
    )
    d = F.col(id_col).cast("long")
    words = F.split(F.col(text_col), " ")
    base = df.select(d.alias(id_col), words.alias("w"))
    joined = base.join(cov, id_col, "left").select(
        id_col,
        "w",
        F.coalesce("cov", F.array().cast("array<int>")).alias("cov"),
    )
    kept = F.filter(
        F.col("w"), lambda x, i: ~F.array_contains(F.col("cov"), i)
    )
    return joined.select(
        id_col,
        F.size("w").cast("long").alias("n_words"),
        F.size("cov").cast("long").alias("n_removed"),
        F.floor(F.size("cov") * 1000 / F.size("w")).cast("long").alias("dup_span_pm"),
        F.md5(F.array_join(kept, " ")).alias("clean_md5"),
    )
