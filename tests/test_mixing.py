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
