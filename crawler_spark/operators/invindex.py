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
