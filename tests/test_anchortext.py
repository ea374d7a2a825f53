"""Anchor-text rollup: term counting, top-k, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.anchortext import (
    anchor_terms_topk,
    synth_anchor_edges,
)


@pytest.mark.spark
def test_topk_counts_and_ties(spark):
    edges = spark.createDataFrame(
        [
            (1, 10, "Download  page"),
            (2, 10, "download now"),
            (3, 10, "news page"),
            (4, 20, "home"),
        ],
        "src long, dst long, anchor string",
    )
    got = {
        (r["dst"], r["term"]): (r["n_refs"], r["rk"])
        for r in anchor_terms_topk(edges, k=2).collect()
    }
    # 'download' normalized to lower, counted across sources; double
    # space yields no empty term; k=2 keeps top-2 per dst
    assert got[(10, "download")] == (2, 1)
    assert got[(10, "page")] == (2, 2)  # tie with 'download' → term asc
    assert (10, "news") not in got and (10, "now") not in got
    assert got[(20, "home")] == (1, 1)


@pytest.mark.spark
def test_synth_deterministic_and_no_empty_terms(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    e = synth_anchor_edges(docs, 60).cache()
    a = sorted(e.collect(), key=lambda r: (r["src"], r["dst"]))
    b = sorted(synth_anchor_edges(docs, 60).collect(), key=lambda r: (r["src"], r["dst"]))
    assert a == b  # closed-form: bit-stable across runs
    assert all(len(r["anchor"].split(" ")) == 2 for r in a)
    out = anchor_terms_topk(e)
    assert out.where(F.length("term") == 0).count() == 0
    assert out.where(F.col("rk") > 3).count() == 0
    e.unpersist()
