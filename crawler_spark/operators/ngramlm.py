"""Corpus n-gram language-model counts with threshold pruning.

The classic distributed-LM workload (Brants et al. 2007, "Large
Language Models in Machine Translation"): count every 1..N-gram in the
corpus, prune the long tail below a count threshold, and attach each
surviving n-gram's backoff context count — the sufficient statistics
for a stupid-backoff LM, and the raw material for n-gram-overlap
decontamination and repetition analysis at corpus scale. The reference
has no LM tier; this is a beyond-reference training-data operator
(SURVEY §2.11) in the same family as `tfidf_top_terms`.

Determinism contract: counts are exact int64; the backoff relative
frequency is the integer surrogate ``rf_pm = cnt * 1000 div ctx_cnt``
(per-mille, monotone in cnt/ctx_cnt, bit-identical across engines —
same trick as termstats.idf_ppm). Tokenization is a bare space split
in BOTH engines (Spark ``split(text, ' ')`` ≡ DuckDB
``string_split(text, ' ')``) so gram strings match byte-for-byte.

Scale shape (100 TB corpus):
- one explode per order n fans out ~n× the token count; each feeds a
  partial-agg ``groupBy(gram).count()`` — map-side combine absorbs the
  Zipf head before the shuffle, and after the agg every heavy hitter
  is a single row (no group skew downstream);
- pruning (``cnt >= threshold``) lands BEFORE the context join — at
  web scale the count-1 tail is the overwhelming majority of distinct
  n-grams (Brants et al. prune at 40), so the join's both sides are
  the post-prune survivors only;
- the context join is a plain equi-join gram→prefix between adjacent
  orders; the unigram context (corpus token total) is a 1-row
  aggregate folded in as a literal via a broadcast-free scalar — but
  to keep the whole thing one lazy plan we join a 1-row frame instead
  of collecting (Catalyst turns it into a broadcast).

Pruned-but-referenced contexts: a surviving n-gram's prefix can itself
be pruned only if threshold(n-1) > threshold(n); the default thresholds
are monotone non-increasing in that direction (an (n-1)-gram count ≥
any of its extensions' counts), so the context join is always an inner
join with no loss — asserted in tests with a planted corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Brants et al. prune at count<40 corpus-scale; the bench corpora are
# tiny so the defaults keep the same *shape* (tail pruned) at small SF.
NGRAM_MAX_ORDER = 3
NGRAM_PRUNE_MIN = 2  # applied to every order ≥ 2; unigrams kept at ≥ 1
RF_SCALE = 1_000


def _grams(docs: DataFrame, n: int) -> DataFrame:
    """One row per n-gram occurrence: (gram, prefix) — prefix is the
    (n-1)-token backoff context ('' for unigrams). Pure JVM: split →
    transform(sequence) slice → explode, no Python."""
    w = F.split(F.col("text"), " ")
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
    # empty list, and slice(w, 0, n) throws — short docs get [] instead
    pos = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        pos, lambda i: F.array_join(F.slice(w, i, n), " ")
    )
    out = docs.select(F.explode(gram).alias("gram"))
    if n == 1:
        return out.withColumn("prefix", F.lit(""))
    return out.withColumn(
        "prefix", F.regexp_replace("gram", " [^ ]*$", "")
    )


def ngram_lm_counts(
    docs: DataFrame,
    max_order: int = NGRAM_MAX_ORDER,
    prune_min: int = NGRAM_PRUNE_MIN,
) -> DataFrame:
    """(n, gram, cnt, ctx_cnt, rf_pm) for every surviving n-gram,
    n = 1..max_order: cnt = corpus occurrence count (pruned below
    ``prune_min`` for n ≥ 2), ctx_cnt = the (n-1)-gram backoff context
    count (corpus token total for unigrams), rf_pm = cnt*1000 div
    ctx_cnt — the stupid-backoff relative frequency in exact per-mille."""
    per_order = []
    for n in range(1, max_order + 1):
        g = _grams(docs, n)
        cnt = g.groupBy("gram", "prefix").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # (gram, prefix) is 1:1 — prefix is a function of gram — so this
        # single agg carries the join key through without a second pass.
        if n >= 2:
            cnt = cnt.where(F.col("cnt") >= prune_min)
        if n < max_order:
            # consumed twice: as this order's output and as the next
            # order's backoff-context side — persist so the explode+agg
            # subtree runs once (same convention as the LSH band table)
            cnt = cnt.persist()
        per_order.append(cnt.withColumn("n", F.lit(n)))

    uni = per_order[0]
    # corpus token total == sum of unigram counts, but one plain column
    # scan (sum of split sizes) is far cheaper than re-aggregating the
    # unigram subtree; NULL texts drop from both forms identically
    total = docs.agg(
        F.sum(F.size(F.split("text", " "))).alias("ctx_cnt")
    )  # 1 row, broadcast
    out = [
        uni.crossJoin(F.broadcast(total)).select(
            "n", "gram", "cnt", "ctx_cnt"
        )
    ]
    for n in range(2, max_order + 1):
        ctx = per_order[n - 2].select(
            F.col("gram").alias("prefix"), F.col("cnt").alias("ctx_cnt")
        )
        out.append(
            per_order[n - 1]
            .join(ctx, "prefix")
            .select("n", "gram", "cnt", "ctx_cnt")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.withColumn(
        "rf_pm", F.expr(f"(cnt * {RF_SCALE}) div ctx_cnt")
    ).select("n", "gram", "cnt", "ctx_cnt", "rf_pm")
