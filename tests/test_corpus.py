"""Corpus generator: determinism, invariants, byte-identical text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.decode import decode_bulk_udf
from crawler_spark.sources.corpus import generate_links, generate_pages, generate_seeds

N = 3000


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N, num_warcs=8).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.spark
def test_deterministic_across_parallelism(spark, pages):
    """Same (seed, n) at different partition counts → identical rows.
    This is the property the two-parallelism scaling bench relies on."""
    a = pages.orderBy("warc_offset").select("url", "warc_source", "mime").collect()
    b = (
        generate_pages(spark, N, num_warcs=8, partitions=3)
        .orderBy("warc_offset")
        .select("url", "warc_source", "mime")
        .collect()
    )
    assert a == b


@pytest.mark.spark
def test_text_is_byte_identical_to_bulk_decode(spark, pages):
    """The stored text column == decode_bulk_udf(html) for every row —
    the per-row invariant of the north rule."""
    mismatches = (
        pages.withColumn("re", decode_bulk_udf(F.col("html")))
        .where(F.col("re") != F.col("text"))
        .count()
    )
    assert mismatches == 0


@pytest.mark.spark
def test_planted_invariants(spark, pages):
    n = pages.count()
    assert n == N
    # mega-host skew: top host ~20%
    from crawler_spark.functions.url import canonicalize_udf

    hosts = (
        pages.select(canonicalize_udf("url").alias("c"))
        .groupBy(F.regexp_extract("c.host", r"(site\d+\.\w+)$", 1).alias("base"))
        .count()
        .orderBy(F.desc("count"))
        .limit(2)
        .collect()
    )
    assert hosts[0]["count"] / n > 0.15, "mega-host share"
    # duplicates across warc sources exist
    dup_urls = (
        pages.groupBy("url")
        .agg(F.countDistinct("warc_source").alias("w"))
        .where(F.col("w") >= 2)
        .count()
    )
    assert dup_urls > 0
    # gzip mix: ~70% of html starts with the gzip magic
    gz = pages.where(F.expr("substring(html, 1, 2) = X'1F8B'")).count()
    assert 0.6 < gz / n < 0.8
    # class mix sanity: some high-confidence pages exist
    assert pages.where(F.col("text").contains("__NEXT_DATA__")).count() > 0.04 * n


@pytest.mark.spark
def test_links_and_seeds_shapes(spark):
    links = generate_links(spark, 500, avg_fanout=4)
    assert links.columns == ["src_url", "dst_url"]
    assert links.count() > 500
    seeds = generate_seeds(spark, 50, 500)
    assert seeds.count() == 50
    assert seeds.where(F.col("url").contains(".invalid")).count() >= 0


def test_corpus_classify_fixture_matches_reference_oracle():
    """The hardcoded corpus_classify fixture (sqlgen.CORPUS_CLASSIFY_EXPECTED)
    must equal the histogram re-derived from the row-at-a-time reference
    decode+detector — catches any drift in generator, detector, or fixture."""
    import sys

    sys.path.insert(0, ".")
    from tools.gen_corpus_fixture import expected_histogram

    from crawler_spark.oracle.sqlgen import (
        CORPUS_CLASSIFY_EXPECTED,
        CORPUS_CLASSIFY_N_PAGES,
    )

    assert expected_histogram(CORPUS_CLASSIFY_N_PAGES) == CORPUS_CLASSIFY_EXPECTED
