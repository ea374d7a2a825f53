"""Distributed inverted-index build: term → (df, cnt, posting-list head).

The search-side corpus artifact every crawl pipeline eventually feeds
(the reference stops at per-page detection; indexing its output corpus
is the natural next consumer — beyond-reference, SURVEY §2.11). Output
per surviving term: document frequency, total occurrence count, and
the head of the posting list (the ``head_k`` smallest doc_ids) — the
exact shape a sharded index loader consumes.

Portability: tokenization is the engine-wide bare space split; df/cnt
are exact int64; the posting head is a deterministic sorted int64
array, so the DuckDB twin reproduces every cell.

Scale shape (100 TB corpus, the interesting part):
- ``groupBy(term, doc_id)`` first — a partial agg that collapses the
  token stream to unique (term, doc) pairs before anything else;
- df/cnt is one more partial agg: heavy terms are ONE row after it;
- the posting head is the classic skewed-top-K problem: a stopword's
  doc set is ~every doc in the corpus, so a plain
  ``Window.partitionBy(term)`` or ``collect_list`` funnels 10^8+ rows
  through one task. Solved with a salted two-phase min-K:
  phase 1 ranks within (term, salt = doc_id % SALT) — SALT-way
  parallel even for the worst stopword, streaming row_number, output
  capped at SALT×head_k rows per term; phase 2 re-ranks those few
  survivors per term. Result is byte-identical to the direct min-K
  (both phases keep exactly the globally smallest doc_ids) while no
  task ever sees more than (term's rows)/SALT + SALT×head_k rows.
- ``min_df`` prunes hapax noise AFTER stats (it cannot change them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INV_HEAD_K = 8
INV_MIN_DF = 2
INV_SALT = 16


def inverted_index(
    docs: DataFrame,
    head_k: int = INV_HEAD_K,
    min_df: int = INV_MIN_DF,
    salt: int = INV_SALT,
) -> DataFrame:
    """(term, df, cnt, postings_head): document frequency, corpus
    occurrence count, and the head_k smallest doc_ids per term with
    df ≥ min_df. Deterministic; skew-bounded as per module docstring."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    td = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cnt")
    )
    # salted two-phase min-K: phase 1 caps each (term, salt) shard at
    # head_k rows (streaming rank), phase 2 ranks the ≤ salt*head_k
    # survivors — identical output to a direct per-term min-K
    w1 = Window.partitionBy("term", "_s").orderBy("doc_id")
    w2 = Window.partitionBy("term").orderBy("doc_id")
    head = (
        td.withColumn("_s", F.col("doc_id") % salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= head_k)
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= head_k)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings_head"))
    )
    return (
        stats.where(F.col("df") >= min_df)
        .join(head, "term")
        .select("term", "df", "cnt", "postings_head")
    )


PS_BUCKET = 4_096  # doc_id-space bucket width for the hierarchical gaps


def postings_size_plan(docs: DataFrame, min_df: int = INV_MIN_DF) -> DataFrame:
    """(term, df, raw_bytes, gamma_bits, varint_bytes, ratio_pm) — the
    index-storage sizing pass: per term, the exact cost of its posting
    list under delta-gap compression (Elias-γ bits and LEB128/varint
    bytes — Witten/Moffat/Bell, "Managing Gigabytes", ch. 3; the same
    arithmetic every Lucene/Tantivy-style index does before writing).
    ``ratio_pm`` = varint bytes as per-mille of the raw 8-byte-per-doc
    encoding — the decision number for whether a term's postings are
    worth compressing.

    Exact-integer contract: gap of the first posting is doc_id + 1
    (implicit −1 base, so every gap ≥ 1); bit length is
    ``length(bin(gap))`` — integer string length, no float log2 whose
    boundary rounding differs across engines; γ(g) = 2·bits − 1;
    varint(g) = ⌈bits/7⌉.

    Scale shape — the skew case is a stopword term whose posting list
    is ~the whole corpus, and gap coding needs SORTED order, so a
    plain ``Window.partitionBy(term).orderBy(doc_id)`` would funnel
    10^8+ rows through one task. Hierarchical two-level gaps instead
    (same discipline as this module's salted min-K): doc_id space is
    cut into fixed ``PS_BUCKET``-wide buckets; within-(term, bucket)
    windows are bounded by the bucket width regardless of df; the
    bucket-boundary gaps come from a second window over the per-bucket
    max summary — |postings|/PS_BUCKET rows per term, PS_BUCKET× fewer
    — and both levels together reproduce exactly the flat sorted-order
    gaps (the oracle computes them naively and matches row-for-row)."""
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", F.col("doc_id").cast("long").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("_tf"))
        .withColumn("bkt", F.expr(f"doc_id div {PS_BUCKET}"))
    )
    w_in = Window.partitionBy("term", "bkt").orderBy("doc_id")
    gaps_in = p.withColumn("_prev", F.lag("doc_id").over(w_in))
    bsum = p.groupBy("term", "bkt").agg(F.max("doc_id").alias("bmax"))
    w_b = Window.partitionBy("term").orderBy("bkt")
    prev_bucket = bsum.withColumn("pmax", F.lag("bmax").over(w_b)).select(
        "term", "bkt", "pmax"
    )
    # bucket-first rows take their predecessor from the summary; the
    # summary side is PS_BUCKET× smaller than the postings
    gap = F.col("doc_id") - F.coalesce("_prev", "pmax", F.lit(-1))
    bits = F.length(F.bin(gap))
    per_posting = gaps_in.join(prev_bucket, ["term", "bkt"]).select(
        "term",
        (bits * 2 - 1).cast("long").alias("gamma_bits"),
        F.floor((bits + 6) / 7).cast("long").alias("varint_bytes"),
    )
    out = per_posting.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("gamma_bits").alias("gamma_bits"),
        F.sum("varint_bytes").alias("varint_bytes"),
    )
    return out.where(F.col("df") >= min_df).select(
        "term",
        "df",
        (F.col("df") * 8).cast("long").alias("raw_bytes"),
        "gamma_bits",
        "varint_bytes",
        F.expr("varint_bytes * 1000 div (df * 8)").cast("long").alias("ratio_pm"),
    )
