"""Corpus term statistics: TF-IDF top terms per source.

Corpus curation wants per-slice characteristic vocabulary (domain
labeling, topic balance audits, keyword-based filtering — e.g. the
C4/mC4 "bad words" pass generalized to learned term weights). This is
the classic TF-IDF shape: term frequency per slice × inverse document
frequency over the corpus, top-k per slice.

Determinism contract: the textbook idf = ln(N/df) is a float whose last
ULP can differ between JVM Math.log and C libm, so the score here is the
**log-free integer surrogate** idf_ppm = (N * 10^6) div df — the same
ordering for fixed tf (monotone in N/df), exact in int64, bit-identical
across engines. Top-k ties break on the term string, a total order.

Scale shape (100 TB corpus):
- the token explode is the fan-out stage; both aggregates after it
  (tf per (source, term), df per term) are partial-agg group-bys —
  map-side combine absorbs the blow-up before any shuffle;
- tf ⋈ df is an equi-join on term — shuffle-on-key; the vocabulary is
  Zipfian, but df rows are one per term so no skew salting is needed
  (the heavy hitters are single rows, not groups);
- the final top-k is a window partitioned by source — bounded output
  (k rows per source).

Overflow: tf and idf_ppm are each int64-exact, but their PRODUCT can
exceed int64 at 10^10-doc scale (df=1, tf=10^3 ⇒ 10^19), so ``score``
is a double — one IEEE multiply of two integer-exact operands, the
same rounding in both engines, bit-identical; ordering degrades only
in the >2^53 regime where adjacent scores differ by <1 ulp, and the
top-k tie-break on the term string stays a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import STOPWORDS

TFIDF_TOPK = 5
IDF_SCALE = 1_000_000


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOPK) -> DataFrame:
    """(source, term, tf, df, idf_ppm, score) — the k highest-scoring
    non-stopword terms per source, score = tf * ((n_docs*10^6) div df)
    as a double (see module docstring on overflow)."""
    n_docs = docs.count()  # one bounded driver scalar (same role as the
    # bloom sizing estimate); at 10^10 docs keep it as a cached count
    toks = docs.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("term"),
    ).where(~F.col("term").isin(STOPWORDS) & (F.col("term") != ""))
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        toks.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_, "term")
        .withColumn("idf_ppm", F.expr(f"({n_docs}L * {IDF_SCALE}) div df"))
        .withColumn("score", F.col("tf").cast("double") * F.col("idf_ppm").cast("double"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("source", "term", "tf", "df", "idf_ppm", "score")
    )


# ------------------------------------------------- BPE merge statistics --
#
# The first step of byte-pair-encoding tokenizer training (Sennrich et
# al. 2016; GPT-2's BPE): count adjacent symbol pairs over the corpus
# and merge the most frequent. Training a tokenizer on a 100 TB corpus
# is exactly a distributed counting problem — this operator emits the
# first-iteration sufficient statistics (adjacent CHARACTER pair
# counts within words) and the top merge candidates. Subsequent merge
# rounds re-run the same shape over re-segmented words; the per-round
# plan is what matters at scale, and it is one map (explode pairs) +
# one partial agg + TakeOrdered — no shuffle beyond the count.
#
# Determinism: counts are exact int64; the top-k ties break on the
# pair string (total order). Words shorter than 2 chars contribute no
# pairs — filtered BEFORE the transform so Spark's sequence() never
# sees an empty/descending range.

BPE_TOP_K = 20


def bpe_pair_counts(docs: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """(pair, cnt): the top-``k`` most frequent adjacent character
    pairs within words — the first BPE merge candidates."""
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


# The SECOND training round — the part that proves the loop, not just
# the first count: apply merge #1 (greedy left-to-right, which is
# exactly what SQL replace() does: non-overlapping, leftmost-first —
# the same tie policy Sennrich's reference implementation uses) and
# re-count adjacent SYMBOL pairs over the re-segmented words. The
# merged symbol is carried as one sentinel char (\\x01) so the
# re-segmented word stays a flat string and the pair scan stays the
# same substring transform — no arrays, no UDF; display maps the
# sentinel back to "(pair)". Words that already contain the sentinel
# byte are dropped identically in both engines (they cannot occur in
# text, but the filter makes the contract total). Per-round plan is
# unchanged: one 1-row broadcast (the winning merge) + map + partial
# agg — the fixed point a 100 TB tokenizer-training driver loops on.


def bpe_merge_round(docs: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """(pair, cnt): top-``k`` adjacent symbol pairs AFTER applying the
    corpus's #1 merge — round two of BPE training. The merged symbol
    prints as ``(xy)``."""
    top1 = bpe_pair_counts(docs, 1).select(F.col("pair").alias("m1"))
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 2)
        .where(F.expr("instr(w, chr(1)) = 0"))
    )
    merged = words.crossJoin(F.broadcast(top1)).select(
        F.expr("replace(w, m1, chr(1))").alias("w2"), "m1"
    )
    pairs = merged.where(F.length("w2") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w2) - 1), i -> substring(w2, i, 2))")
        ).alias("p"),
        "m1",
    )
    return (
        pairs.groupBy("p", "m1")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.expr("replace(p, chr(1), '(' || m1 || ')')").alias("pair"), "cnt"
        )
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


VOCAB_KS = (100, 1_000, 10_000)


def vocab_coverage(docs: DataFrame, ks: tuple = VOCAB_KS) -> DataFrame:
    """(k, vocab_terms, covered_tokens, total_tokens, coverage_pm) —
    the tokenizer-budget decision table: how much of the corpus token
    stream does a top-k word vocabulary cover? (The Zipf curve every
    tokenizer design starts from — BPE exists because word-level top-k
    flattens out; this measures exactly where, per corpus.) One row per
    candidate vocab size k.

    Scale shape: unigram counts are one partial agg (Zipf head absorbed
    map-side); the rank is DISTRIBUTED (operators/rankdist.
    distributed_rank: range exchange + per-partition row_number +
    broadcast offsets) because web-scale vocab is NOT safely ~10^7 —
    id-polluted text grows it to 10^8–10^9 types (this repo's own
    heaps_curve exists to measure exactly that), far past what one
    unpartitioned window task can sort; the per-k coverage is ONE
    conditional-sum aggregate over the ranked vocab (no per-k join, no
    second pass), unpivoted to k rows at the end. Ties rank
    (cnt desc, word asc) — total and engine-portable."""
    from crawler_spark.operators.rankdist import distributed_rank

    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = distributed_rank(counts, [F.desc("cnt"), F.col("w")], "r")
    aggs = [
        F.count(F.lit(1)).alias("v"),
        F.sum("cnt").alias("total"),
    ] + [
        F.sum(F.when(F.col("r") <= k, F.col("cnt")).otherwise(0)).alias(f"c{k}")
        for k in ks
    ]
    one = ranked.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.least(F.lit(k).cast("long"), F.col("v")).alias("vocab_terms"),
                F.col(f"c{k}").cast("long").alias("covered_tokens"),
            )
            for k in ks
        ]
    )
    return (
        one.select(F.explode(rows).alias("x"), F.col("total"))
        .select(
            "x.k",
            "x.vocab_terms",
            "x.covered_tokens",
            F.col("total").cast("long").alias("total_tokens"),
            F.expr("x.covered_tokens * 1000 div total").cast("long").alias(
                "coverage_pm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth curve
# ---------------------------------------------------------------------------
HEAPS_BUCKETS = 20


def heaps_curve(docs: DataFrame, n_docs: int, buckets: int = HEAPS_BUCKETS) -> DataFrame:
    """(bucket, n_tokens, cum_tokens, new_words, cum_vocab) — the
    vocabulary-growth curve V(N) over a deterministic corpus prefix
    order (doc_id ascending, split into ``buckets`` equal-width
    slices). Heaps' law (Heaps 1978; Herdan 1960, public) predicts
    V(N) ≈ K·N^β with β ≈ 0.4–0.6 for natural text; the measured curve
    is the tokenizer-planning companion to the Zipf-side
    ``vocab_coverage`` — it answers "how fast does the open vocabulary
    still grow at the corpus tail", i.e. whether more crawl keeps
    buying new types, and a curve that keeps rising LINEARLY is the
    classic symptom of an id-/hash-polluted corpus (session tokens
    inflating the vocabulary).

    Exact integers throughout: a word's contribution to ``new_words``
    lands in the bucket of its FIRST occurrence (min bucket per word —
    one partial agg), cumulative sums run over ≤ ``buckets`` rows.

    Scale shape: one explode + two partial aggs over the corpus
    (per-bucket token counts; min-bucket per word), then windows over
    ``buckets`` rows only."""
    # ceil in non-negative-int form — identical under truncating AND
    # flooring integer division, so the SQL twin cannot drift
    width = max(1, (n_docs + buckets - 1) // buckets)
    toks = docs.select(
        F.expr(f"CAST(doc_id AS BIGINT) div {width}").alias("bucket"),
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    )
    per_bucket = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = toks.groupBy("w").agg(F.min("bucket").alias("bucket"))
    new_words = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_words")
    )
    from pyspark.sql import Window

    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(new_words, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("new_words", F.lit(0)).cast("long").alias("new_words"),
        )
        .select(
            "bucket",
            "n_tokens",
            F.sum("n_tokens").over(cum).cast("long").alias("cum_tokens"),
            "new_words",
            F.sum("new_words").over(cum).cast("long").alias("cum_vocab"),
        )
    )
