"""Tests for content-defined chunking and relative spam mass."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.cdc import CDC_DIV, cdc_chunks
from crawler_spark.operators.linkgraph import (
    pagerank,
    spam_mass,
    trustrank,
)


def _chunks(spark, texts, div=CDC_DIV):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return cdc_chunks(df, div=div)


def test_cdc_chunks_cover_document_exactly(spark):
    text = " ".join(f"word{i}" for i in range(100))
    rows = _chunks(spark, [text]).orderBy("chunk_idx").collect()
    assert sum(r["n_words"] for r in rows) == 100
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    assert all(r["n_words"] >= 1 for r in rows)


def test_cdc_boundaries_are_content_defined_not_positional(spark):
    """The LBFS property: prepending words changes only the chunks up
    to the first boundary — every chunk after it is byte-identical, so
    its corpus-wide copy count sees the shared content."""
    base = " ".join(f"word{i}" for i in range(100))
    shifted = "prefixa prefixb prefixc " + base
    out = _chunks(spark, [base, shifted])
    dup_mass = (
        out.where(F.col("is_dup"))
        .groupBy("doc_id")
        .agg(F.sum("n_words").alias("m"))
        .collect()
    )
    got = {r["doc_id"]: r["m"] for r in dup_mass}
    # nearly all of the 100 shared words land in shared chunks; only
    # the run up to the first content boundary can differ
    assert got.get(0, 0) >= 80
    assert got.get(1, 0) >= 80


def test_cdc_exact_duplicates_fully_dup(spark):
    text = " ".join(f"tok{i}" for i in range(50))
    out = _chunks(spark, [text, text])
    assert out.where(~F.col("is_dup")).count() == 0
    assert out.where(F.col("n_copies") != 2).count() == 0


def test_cdc_single_word_document(spark):
    rows = _chunks(spark, ["lonely"]).collect()
    assert len(rows) == 1
    assert rows[0]["n_words"] == 1 and rows[0]["chunk_idx"] == 0


def _star_graph(spark):
    """Seed 0 links to 1; spam farm {10,11} links only to each other."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 10)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11)], ["node"])
    seeds = nodes.where(F.col("node") == 0)
    return edges, nodes, seeds


def test_spam_mass_farm_vs_trusted_chain(spark):
    edges, nodes, seeds = _star_graph(spark)
    pr = pagerank(edges, nodes, 5)
    tr = trustrank(edges, nodes, seeds, 1)
    got = {r["doc_id"]: r for r in spam_mass(pr, tr).collect()}
    # farm nodes are unreachable from trust -> full spam mass, flagged
    assert got[10]["trust_ppb"] == 0 and got[11]["trust_ppb"] == 0
    assert got[10]["spam_mass_pm"] == 1000 and got[10]["spam_flag"]
    # the trusted chain carries trust -> low mass, not flagged
    assert got[0]["is_seed"] and not got[0]["spam_flag"]
    assert got[1]["spam_mass_pm"] < 990 and not got[1]["spam_flag"]
    assert got[2]["trust_ppb"] > 0


def test_spam_mass_clamped_nonnegative(spark):
    edges, nodes, seeds = _star_graph(spark)
    pr = pagerank(edges, nodes, 5)
    tr = trustrank(edges, nodes, seeds, 1)
    out = spam_mass(pr, tr)
    assert out.where(F.col("spam_mass_pm") < 0).count() == 0
    assert out.where(F.col("spam_mass_pm") > 1000).count() == 0
