"""Skip-gram co-occurrence counts — the embedding-training statistic.

Word-embedding training (word2vec SGNS, Mikolov et al. 2013; GloVe,
Pennington et al. 2014 — both public) starts from one corpus-wide
statistic: how often word a appears within a ±W token window of word b,
with closer positions weighted higher (GloVe weights a pair at offset d
by 1/d). At web scale this count table IS the training set — computing
it is a canonical 100 TB distributed job, and its output doubles as a
collocation table for phrase mining and a context signal for
distributional lang-ID.

The reference has no embedding tier; this extends the LLM-pipeline
surface (SURVEY §2.11) alongside `ngram_lm_counts` / `tfidf_top_terms`.

Determinism contract: pairs are UNDIRECTED with the canonical
lexicographic orientation (a = least, b = greatest — same convention as
the dedup pair generators' id_a < id_b); the distance weight is the
exact integer per-mille ``1000 div d`` summed over occurrences, so the
DuckDB twin is row-identical (no float 1/d).

Scale shape (100 TB corpus):
- pair generation is a pure map: split → per-offset transform(sequence)
  zip → explode — no Python, no shuffle, fan-out ≤ W× token count;
- ONE partial-agg groupBy(a, b) over the union of offsets: map-side
  combine absorbs the Zipf head (the/of pairs) before the shuffle, and
  after the agg every heavy pair is a single row — no group skew
  downstream;
- the count-1 tail (the overwhelming majority of distinct pairs, same
  Zipf argument as n-gram pruning in Brants et al. 2007) is pruned by
  ``min_count`` INSIDE the agg's HAVING position, before anything
  downstream sees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COOC_WINDOW = 3  # ±W tokens
COOC_MIN_COUNT = 2  # prune the count-1 tail
COOC_W_SCALE = 1_000  # integer GloVe-style distance weight: 1000 div d


def skipgram_pairs(
    docs: DataFrame,
    window: int = COOC_WINDOW,
    min_count: int = COOC_MIN_COUNT,
    text_col: str = "text",
) -> DataFrame:
    """(a, b, cnt, w_pm) — undirected co-occurrence counts within a
    ±``window`` token span: cnt = occurrence count across the corpus,
    w_pm = Σ (1000 div d) over those occurrences (GloVe-style closeness
    mass, exact integer). Pairs with cnt < ``min_count`` are pruned;
    self-pairs (a = b at distance d) are kept — a repeated token is a
    real distributional signal (and dropping it would special-case the
    oracle for no modelling reason)."""
    w = F.split(F.col(text_col), " ")

    def _pair_at(d: int):
        # closure factory, NOT a default-arg lambda: pyspark dispatches
        # on the callable's arity, so a 2-parameter lambda would be
        # called as (element, index) and the second parameter would be
        # silently bound to the array index instead of the offset
        def f(i):
            return F.struct(
                F.least(
                    F.element_at(w, i), F.element_at(w, i + F.lit(d))
                ).alias("a"),
                F.greatest(
                    F.element_at(w, i), F.element_at(w, i + F.lit(d))
                ).alias("b"),
            )

        return f

    per_offset = []
    for d in range(1, window + 1):
        pos = F.when(
            F.size(w) > d, F.sequence(F.lit(1), F.size(w) - d)
        ).otherwise(F.array().cast("array<int>"))
        pair = F.transform(pos, _pair_at(d))
        per_offset.append(
            docs.select(F.explode(pair).alias("p")).select(
                "p.a", "p.b", F.lit(COOC_W_SCALE // d).cast("long").alias("w")
            )
        )
    allp = per_offset[0]
    for p in per_offset[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("w").alias("w_pm"),
        )
        .where(F.col("cnt") >= min_count)
    )


# ---------------------------------------------------------------------------
# Collocation mining — integer-lift PMI surrogate over the pair counts
# ---------------------------------------------------------------------------
COLLOC_TOPK = 50


def collocation_topk(
    docs: DataFrame,
    window: int = COOC_WINDOW,
    min_count: int = COOC_MIN_COUNT,
    k: int = COLLOC_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """(a, b, cnt, ca, cb, lift_pm) — the ``k`` strongest collocations
    by integer lift, the log-free PMI surrogate (association-rule
    "interest", Brin, Motwani, Silverstein, SIGMOD 1997; PMI itself is
    Church & Hanks 1990): lift = P(a,b)/(P(a)·P(b)) realized as
    lift_pm = cnt · N · 1000 div (ca · cb) with N the corpus token
    count — monotone in PMI at fixed N, so the top-k set is the PMI
    top-k, with no float/log crossing an engine boundary.

    Phrase mining is the consumer: collocations above a lift bar become
    vocabulary merge candidates (word2vec's phrase pass, Mikolov et al.
    2013 §4, uses exactly this score shape with a discount).

    int64 bound: cnt ≤ W·N, so the numerator is < 2^63 while
    N < ~5·10^7 tokens — far above bench SF; at corpus scale shift both
    N and cnt down by the same power of two first (documented, same
    discipline as mixing.TAIL_SHIFT).

    Scale shape: pair counts and unigram counts are each ONE
    partial-agg pass; the lift join touches only pairs that survived
    the min-count prune; top-k is a TakeOrdered (no global sort
    materialization) with the total order (lift desc, a, b)."""
    pairs = skipgram_pairs(docs, window, min_count, text_col)
    toks = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Fail fast on the int64 bound instead of wrapping silently
    # (non-ANSI Spark wraps; DuckDB would diverge) — same discipline as
    # linkgraph._check_rank_resolution, but in-plan (assert_true on the
    # 1-row total: zero extra jobs). cnt ≤ window·N, so the numerator
    # cnt·N·1000 stays < 2^63 only while N ≤ sqrt(2^63/(1000·window));
    # past that, apply the documented power-of-two down-shift to BOTH
    # engines before calling.
    n_max = int(((1 << 63) // (1000 * window)) ** 0.5)
    guard = F.assert_true(
        F.col("_n") <= F.lit(n_max),
        F.lit(
            f"collocation_topk: corpus token count exceeds the int64-safe "
            f"bound {n_max} for window={window}; shift N and cnt down by "
            f"the same power of two first (see docstring)"
        ),
    )
    n_total = toks.agg(F.sum("c").cast("long").alias("_n")).select(
        (F.col("_n") + F.coalesce(guard.cast("long"), F.lit(0))).alias("_n")
    )
    j = (
        pairs.join(toks.select(F.col("tok").alias("a"), F.col("c").alias("ca")), "a")
        .join(toks.select(F.col("tok").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(n_total))
    )
    return (
        j.select(
            "a", "b", "cnt", "ca", "cb",
            F.expr("cnt * _n * 1000 div (ca * cb)").alias("lift_pm"),
        )
        .orderBy(F.desc("lift_pm"), F.asc("a"), F.asc("b"))
        .limit(k)
    )
