"""Corpus mix allocation — turning crawl strata into a training recipe.

Every large LM pretraining corpus is a weighted MIX of sources: GPT-3's
published table upsamples Wikipedia ~3 epochs while Common Crawl runs
under one (Brown et al. 2020 §2.2); The Pile and DoReMi publish the
same shape — per-source weights over a token budget. The planning step
is pure arithmetic over per-stratum token counts, but it has to be
exact and auditable: the sampler (operators/sampling.py) executes
whatever rates this plan emits, and a rounding drift of 10^-3 at a
10^13-token budget is 10^10 tokens of silent skew.

Shape: the stats side is one partial-agg group-by over the corpus
(tokens per stratum — the only pass that touches data); the plan join
runs over strata rows only (dozens), so the allocation itself is
driver-scale no matter the corpus size. All integer arithmetic in ppm:

- ``desired = budget · weight_ppm / 10^6`` (integer div),
- ``full_epochs = desired div n_tokens`` — whole passes over the
  stratum (upsampling),
- ``tail_rate_ppm = (desired mod n_tokens) · 10^6 / n_tokens`` — the
  sampling rate for the final partial pass,
- ``planned = n_tokens · full_epochs + n_tokens · tail_rate_ppm / 10^6``
  — reported so the |planned − desired| rounding loss is visible per
  stratum (bounded by 1 ppm of the stratum), never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import bpe_token_count
from crawler_spark.functions.texthash import hex_prefix_value, seeded_md5_key

PPM = 1_000_000
# Past this stratum size, (r · PPM) no longer fits int64; the tail-rate
# division scales r and n down by 2^TAIL_SHIFT first (error < 1 ppm at
# the boundary, relatively smaller beyond; exact below it). 2^22 keeps
# the scaled numerator < 2^63 for every int64 n_tokens.
TAIL_SHIFT_ABOVE = 4_000_000_000_000
TAIL_SHIFT = 22


def stratum_token_stats(docs: DataFrame, stratum_col: str = "source") -> DataFrame:
    """(stratum, n_docs, n_tokens): the one corpus-wide pass."""
    return docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_token_count(F.col("text"))).alias("n_tokens"),
    )


def mix_allocation(
    stats: DataFrame, targets: DataFrame, budget_tokens: int
) -> DataFrame:
    """stats(stratum, n_docs, n_tokens) ⋈ targets(stratum, weight_ppm)
    → per-stratum plan: desired tokens, whole upsampling epochs, the
    tail sampling rate, and the planned total actually achievable.
    FULL outer join so both mismatch directions stay audit-visible:
    a stratum missing a target weight appears with weight 0, and a
    target naming a stratum the corpus lacks appears with zero stats
    and its (unachievable) desired share — never a silently vanished
    slice of the budget."""
    # Overflow discipline (ANSI mode, int64 only — same reduce-before-
    # multiply rule as bloom._positions):
    # - budget·weight and n·tail split exactly around PPM:
    #   x·y div P == (x div P)·y + ((x mod P)·y) div P, every term < 2^63
    #   for any int64 budget/n_tokens.
    # - the tail rate r·P div n has an unbounded denominator, so past
    #   TAIL_SHIFT_ABOVE both r and n are scaled down 2^22 first: the
    #   result shifts by < 1 ppm at the boundary (and relatively less
    #   beyond), and the branch is never taken at oracle scale.
    j = (
        stats.join(targets, "stratum", "full")
        .withColumns(
            {
                "weight_ppm": F.coalesce("weight_ppm", F.lit(0)).cast("long"),
                # a target naming a stratum the corpus lacks must stay a
                # VISIBLE row (its budget share would otherwise vanish
                # silently): zero stats, nonzero desired
                "n_docs": F.coalesce("n_docs", F.lit(0)).cast("long"),
                "n_tokens": F.coalesce("n_tokens", F.lit(0)).cast("long"),
            }
        )
        .withColumn(
            "desired_tokens",
            F.expr(
                f"(CAST({budget_tokens} AS BIGINT) div {PPM}) * weight_ppm"
                f" + ((CAST({budget_tokens} AS BIGINT) % {PPM}) * weight_ppm) div {PPM}"
            ),
        )
        .withColumns(
            {
                # empty strata (n_tokens = 0) plan to zero, not divide-by-zero
                "full_epochs": F.expr(
                    "CASE WHEN n_tokens > 0 THEN desired_tokens div n_tokens "
                    "ELSE CAST(0 AS BIGINT) END"
                ),
                "tail_rate_ppm": F.expr(
                    f"CASE WHEN n_tokens <= 0 THEN CAST(0 AS BIGINT) "
                    f"WHEN n_tokens > {TAIL_SHIFT_ABOVE} THEN "
                    f"((shiftright(desired_tokens % n_tokens, {TAIL_SHIFT})) * {PPM})"
                    f" div shiftright(n_tokens, {TAIL_SHIFT}) "
                    f"ELSE ((desired_tokens % n_tokens) * {PPM}) div n_tokens END"
                ),
            }
        )
    )
    return j.select(
        "stratum",
        "n_docs",
        "n_tokens",
        "weight_ppm",
        "desired_tokens",
        "full_epochs",
        "tail_rate_ppm",
        F.expr(
            f"n_tokens * full_epochs + (n_tokens div {PPM}) * tail_rate_ppm"
            f" + ((n_tokens % {PPM}) * tail_rate_ppm) div {PPM}"
        )
        .cast("long")
        .alias("planned_tokens"),
    )


def synth_mix_targets(stats: DataFrame) -> DataFrame:
    """Closed-form target weights over the strata present: stratum g
    (trailing digits of the name) gets raw weight ``g % 7 + 1``,
    normalized to ppm with the remainder assigned to the
    lexicographically-first stratum so the weights sum to exactly
    10^6 — mirrors hand-written mix tables, which always pin the sum."""
    g = F.regexp_extract("stratum", r"(\d+)$", 1).cast("long")
    raw = stats.select("stratum", (g % 7 + 1).alias("_w"))
    tot = raw.agg(F.sum("_w").alias("_tot"), F.min("stratum").alias("_first"))
    return (
        raw.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            (
                F.expr(f"(_w * {PPM}) div _tot")
                + F.when(
                    F.col("stratum") == F.col("_first"),
                    F.lit(PPM) - F.expr(f"sum((_w * {PPM}) div _tot) over ()"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("weight_ppm"),
        )
    )


MIX_BUDGET_TOKENS = 10_000_000


def mix_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: stats pass → closed-form targets → exact plan."""
    stats = stratum_token_stats(docs)
    return mix_allocation(stats, synth_mix_targets(stats), MIX_BUDGET_TOKENS)


# ------------------------------------------------------ plan execution --

HASH_SPACE = 16 ** 6  # 6 hex digits of md5 -> uniform [0, 16^6)


def _doc_hash_u(seed: str, id_col) -> F.Column:
    """Portable uniform hash in [0, 16^6) via the shared seeded-md5
    helpers (functions/texthash.py) - both engines bit-identical."""
    return hex_prefix_value(seeded_md5_key(seed, id_col), 6)


def execute_mix(
    docs: DataFrame,
    plan: DataFrame,
    seed: str,
    stratum_col: str = "source",
) -> DataFrame:
    """Run the plan: every doc is emitted ``full_epochs`` times plus one
    more copy iff its seeded hash clears the stratum's tail rate —
    deterministic (pure function of corpus, plan, seed), no RNG state,
    so a crash rerun emits the identical sample. Returns the per-stratum
    execution ledger (docs emitted, tokens emitted, planned tokens) —
    the achieved-vs-planned gap is the tail-rate sampling noise, which
    shrinks as 1/√docs per stratum.

    Scale shape: the plan is a broadcast dim; epoch replication is an
    ``explode(sequence())`` map stage (rows out = corpus × epochs, the
    output's inherent size); no shuffle until the ledger rollup."""
    d = docs.select(
        F.col(stratum_col).alias("stratum"),
        F.col("doc_id"),
        bpe_token_count(F.col("text")).alias("_tok"),
    )
    j = d.join(
        F.broadcast(plan.select("stratum", "full_epochs", "tail_rate_ppm", "planned_tokens")),
        "stratum",
    )
    take_tail = (
        _doc_hash_u(seed, F.col("doc_id")) * PPM
        < F.col("tail_rate_ppm") * F.lit(HASH_SPACE)
    )
    copies = (F.col("full_epochs") + take_tail.cast("long")).cast("int")
    emitted = j.where(copies > 0).select(
        "stratum", "doc_id", "_tok", F.explode(F.sequence(F.lit(1), copies)).alias("_c")
    )
    ledger = emitted.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_emitted"),
        F.sum("_tok").alias("tokens_emitted"),
    )
    # plan LEFT JOIN ledger (ledger broadcast): zero-emission strata stay
    # visible; a right join couldn't broadcast-build its preserved side
    return (
        plan.select("stratum", "planned_tokens")
        .join(F.broadcast(ledger), "stratum", "left")
        .select(
            "stratum",
            F.coalesce("n_emitted", F.lit(0)).alias("n_emitted"),
            F.coalesce("tokens_emitted", F.lit(0)).alias("tokens_emitted"),
            "planned_tokens",
        )
    )


MIX_SEED = "mix-r3"


def mix_execute_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: plan then execute — the full mixing loop."""
    stats = stratum_token_stats(docs)
    plan = mix_allocation(stats, synth_mix_targets(stats), MIX_BUDGET_TOKENS)
    return execute_mix(docs, plan, MIX_SEED)


# ---------------------------------------------------------------------------
# Temperature-sampled language budgets (multilingual mixing)
# ---------------------------------------------------------------------------
# Budget to allocate across languages (docs at bench SF; tokens in prod).
TEMP_BUDGET = 10_000


def _isqrt(n) -> F.Column:
    """Exact integer sqrt of a non-negative bigint column, engine-portable:
    float sqrt is correctly rounded in both engines, but the ±1-ulp edge
    is erased by explicit integer correction, so no float ever decides
    the result."""
    s = F.floor(F.sqrt(n)).cast("long")
    return (
        F.when((s + 1) * (s + 1) <= n, s + 1)
        .when(s * s > n, s - 1)
        .otherwise(s)
    )


def lang_temperature_allocation(
    docs: DataFrame, lang_col: str = "lang", budget: int = TEMP_BUDGET
) -> DataFrame:
    """(lang, n_docs, weight, budget_docs, prop_budget, boost_pm) — the
    temperature-sampled multilingual budget every multilingual LM uses
    (Conneau et al., "Unsupervised cross-lingual representation
    learning at scale", ACL 2020 §3.1; mT5, Xue et al. 2021): sampling
    probability q_l ∝ p_l^α flattens the head so low-resource languages
    are not drowned. α = 1/2 here, so weight = isqrt(n_docs) — exact
    integer, no pow/log.

    The budget is divided by the largest-remainder (Hamilton) method:
    base = budget·w div W per language, then the leftover units go to
    the largest remainders (ties broken by lang asc) — deterministic,
    sums exactly to the budget, no float apportionment drift.
    ``prop_budget`` (the α=1 proportional share) and ``boost_pm``
    (budget_docs ·1000 div prop_budget) report the flattening effect.

    Scale shape: one corpus-wide partial agg (docs per lang); every
    later stage runs over |languages| rows (dozens) — two 1-row
    broadcast totals and one tiny unpartitioned window. The corpus is
    touched exactly once."""
    counts = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = counts.select("lang", "n_docs", _isqrt(F.col("n_docs")).alias("weight"))
    totals = w.agg(
        F.sum("weight").alias("_w_total"), F.sum("n_docs").alias("_n_total")
    )
    j = w.crossJoin(F.broadcast(totals)).select(
        "lang", "n_docs", "weight", "_n_total",
        F.expr(f"weight * {budget} div _w_total").alias("base"),
        F.expr(f"(weight * {budget}) % _w_total").alias("rem"),
    )
    leftover = j.agg((F.lit(budget) - F.sum("base")).alias("_left"))
    from pyspark.sql import Window

    rk = F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("lang")))
    out = (
        j.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", rk)
        .select(
            "lang", "n_docs", "weight",
            (F.col("base") + (F.col("_rk") <= F.col("_left")).cast("long"))
            .alias("budget_docs"),
            F.expr(f"n_docs * {budget} div _n_total").alias("prop_budget"),
        )
    )
    return out.select(
        "lang", "n_docs", "weight", "budget_docs", "prop_budget",
        F.expr("budget_docs * 1000 div greatest(prop_budget, 1)").alias("boost_pm"),
    )
