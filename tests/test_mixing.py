"""Mix allocation: exact ppm plan, upsampling epochs, weight pinning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.mixing import (
    PPM,
    mix_allocation,
    stratum_token_stats,
    synth_mix_targets,
)


@pytest.mark.spark
def test_allocation_arithmetic(spark):
    stats = spark.createDataFrame(
        [("wiki", 10, 100), ("cc", 50, 1000), ("empty", 0, 0)],
        "stratum string, n_docs long, n_tokens long",
    )
    targets = spark.createDataFrame(
        [("wiki", 750_000), ("cc", 250_000)], "stratum string, weight_ppm long"
    )
    got = {r["stratum"]: r for r in mix_allocation(stats, targets, 1000).collect()}
    w = got["wiki"]  # desired 750 over 100 tokens: 7 full epochs + half pass
    assert (w["desired_tokens"], w["full_epochs"], w["tail_rate_ppm"]) == (750, 7, 500_000)
    assert w["planned_tokens"] == 750
    c = got["cc"]  # under one epoch: pure rate
    assert (c["desired_tokens"], c["full_epochs"], c["tail_rate_ppm"]) == (250, 0, 250_000)
    assert c["planned_tokens"] == 250
    e = got["empty"]  # no target weight AND no tokens: visible zero row
    assert (e["weight_ppm"], e["desired_tokens"], e["planned_tokens"]) == (0, 0, 0)


@pytest.mark.spark
def test_synth_weights_pin_to_one(spark):
    docs = spark.range(0, 200).select(
        F.concat(F.lit("t"), (F.col("id") % 20).cast("string")).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 9).cast("string")).alias("source"),
    )
    stats = stratum_token_stats(docs)
    wts = synth_mix_targets(stats).collect()
    assert sum(r["weight_ppm"] for r in wts) == PPM
    assert all(r["weight_ppm"] > 0 for r in wts)
    # plan conservation: planned within 1 token-ppm of desired per stratum
    plan = mix_allocation(stats, synth_mix_targets(stats), 500_000).collect()
    for r in plan:
        assert 0 <= r["desired_tokens"] - r["planned_tokens"] <= max(1, r["n_tokens"] // PPM + 1)


@pytest.mark.spark
def test_target_only_stratum_and_petascale_overflow(spark):
    """A target naming a stratum the corpus lacks stays a visible row;
    petascale token counts (r*PPM would pass 2^63) run the shifted
    tail-rate branch instead of overflowing, within 1 ppm of exact."""
    stats = spark.createDataFrame(
        [("cc", 1_000, 5_000_000_000_000_000)],  # 5e15 tokens
        "stratum string, n_docs long, n_tokens long",
    )
    targets = spark.createDataFrame(
        [("cc", 400_000), ("books", 600_000)], "stratum string, weight_ppm long"
    )
    got = {r["stratum"]: r for r in mix_allocation(stats, targets, 10_000_000_000_000_000).collect()}
    b = got["books"]  # corpus lacks it: zero stats, desired visible
    assert (b["n_docs"], b["n_tokens"], b["desired_tokens"]) == (0, 0, 6_000_000_000_000_000)
    assert (b["full_epochs"], b["tail_rate_ppm"], b["planned_tokens"]) == (0, 0, 0)
    c = got["cc"]  # exact rate is 4e15/5e15 = 800000 ppm
    assert c["desired_tokens"] == 4_000_000_000_000_000
    assert abs(c["tail_rate_ppm"] - 800_000) <= 1
    assert 0 <= c["desired_tokens"] - c["planned_tokens"] <= c["n_tokens"] // 1_000_000 + 1


@pytest.mark.spark
def test_execute_mix_deterministic_and_close_to_plan(spark):
    """Execution is a pure function of (corpus, plan, seed): identical
    across reruns and repartitioning; achieved tokens track planned
    within tail-sampling noise; full epochs replicate exactly."""
    from crawler_spark.operators.mixing import execute_mix

    docs = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),  # 2 toks
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    plan = spark.createDataFrame(
        # s0: 2 epochs + half tail; s1: pure half tail; s2: excluded
        [("s0", 2, 500_000, 1000), ("s1", 0, 500_000, 200), ("s2", 0, 0, 0)],
        "stratum string, full_epochs long, tail_rate_ppm long, planned_tokens long",
    )
    a = sorted(execute_mix(docs, plan, "seed-x").collect())
    b = sorted(execute_mix(docs.repartition(5), plan, "seed-x").collect())
    assert a == b
    got = {r["stratum"]: r for r in a}
    # s0: 200 docs x 2 epochs = 400 guaranteed + ~100 tail
    assert got["s0"]["n_emitted"] >= 400
    assert abs(got["s0"]["n_emitted"] - 500) < 60
    assert abs(got["s1"]["n_emitted"] - 100) < 40
    assert got["s2"]["n_emitted"] == 0 and got["s2"]["tokens_emitted"] == 0
    # tokens = 3 BPE tokens per doc ('tok', digits run... verify via ratio)
    assert got["s0"]["tokens_emitted"] == got["s0"]["n_emitted"] * 2
