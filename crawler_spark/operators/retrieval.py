"""BM25 top-k retrieval over the tokenized corpus (exact-integer form).

The consumer of the inverted-index artifact (operators/invindex.py):
given a bag of query terms, rank documents by an Okapi BM25 score and
return the top k. Beyond-reference (SURVEY §2.11) — the reference
stops at per-page detection; ranked retrieval over the crawled corpus
is the canonical next consumer of its output.

Portability (the whole design constraint): classic BM25 needs ln() for
idf and float k1/b weighting, and transcendentals are the one thing
the JVM and DuckDB do NOT compute bit-identically. So, exactly like
``tfidf_top_terms``'s log-free integer idf surrogate and ``lmscore``'s
integer-exact perplexity stand-in, every factor here is exact int64
arithmetic (``div`` in Spark ≡ ``//`` in DuckDB — all operands are
non-negative, so truncation and floor agree):

- tf saturation, k1 = 1.2 and b = 0.75 as exact rationals (6/5, 3/4):

      tf_part      = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
      r_pm         = (dl · 1000 · N) div SUMDL          # dl/avgdl, ‰
      tf_part_pm   = (22_000_000·tf) div (10_000·tf + 3_000 + 9·r_pm)

  (multiply the classic formula through by 10_000/10_000 with
  avgdl = SUMDL/N substituted — same rational, integer operands).

- idf surrogate, rank-preserving in df (monotone ↓, positive):

      idf_pm = (1000·(N − df + 1)) div (df + 1)

- score_pm = Σ_matched idf_pm · tf_part_pm;  top-k by
  (score_pm DESC, doc_id ASC) — total order, no RNG, no floats.

Scale shape (10^10 docs):
- the token stream collapses via TWO partial aggs before any join:
  (doc_id) → dl and (doc_id, term ∈ Q) → tf; the query-term filter is
  a broadcast-size IN-list applied map-side, so only matching
  occurrences ever shuffle;
- df is |Q| rows → broadcast; corpus totals are ONE row → broadcast
  cross (the same 1-row pattern as mixing.py, on the plan-quality
  allowlist);
- the final top-k is an orderBy(...).limit(k) → Spark's
  TakeOrderedAndProject (per-partition heap + driver merge of k·P
  rows), never a global sort.

int64 headroom: the largest intermediate is 22_000_000·tf (tf = term
occurrences in one doc) and dl·1000·N. At 10^10 docs with ≤10^5-token
documents both stay < 2^63; past that, widen r_pm's product to
DECIMAL(38,0)/HUGEINT — the only line that changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

BM25_TOP_K = 10
# mixed-df query: two stopword-ish terms + one rarer term, all present
# in the synthetic corpus vocabulary at every SF
BM25_QUERY = ("join", "vector", "spark")


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str] = BM25_QUERY,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """(doc_id, terms_matched, score_pm): top-``k`` documents for the
    query bag under exact-integer BM25 (module docstring), ties broken
    by doc_id. Deterministic, float-free, skew-safe."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.sum("dl").alias("sumdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.where(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn("r_pm", F.expr("dl * 1000 * n_docs div sumdl"))
        .withColumn(
            "tf_part_pm",
            F.expr("22000000 * tf div (10000 * tf + 3000 + 9 * r_pm)"),
        )
        .withColumn(
            "idf_pm", F.expr("1000 * (n_docs - df + 1) div (df + 1)")
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("terms_matched"),
            F.sum(F.col("idf_pm") * F.col("tf_part_pm")).alias("score_pm"),
        )
        .orderBy(F.desc("score_pm"), F.asc("doc_id"))
        .limit(k)
    )
