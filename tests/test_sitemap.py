"""Sitemap parse: entry extraction, defaults, index docs, tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.sitemap import (
    SITEMAP_DEFAULT_PRIORITY_PPM,
    parse_sitemap_index,
    parse_sitemaps,
    synth_sitemaps,
)

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc> https://h.example/a </loc><lastmod>2026-05-01</lastmod><priority>0.7</priority></url>
<url><loc>https://h.example/b</loc></url>
<url><priority>0.9</priority></url>
<url><loc>https://h.example/p?a=1&amp;b=2</loc><priority>high</priority></url>
<url><loc>https://h.example/q?x=1&#38;y=2&#x26;z=3</loc></url>
</urlset>"""

IDX = """<sitemapindex><sitemap><loc>https://h.example/s1.xml.gz</loc>
<lastmod>2026-04-01</lastmod></sitemap>
<sitemap><loc>https://h.example/s2.xml</loc></sitemap></sitemapindex>"""


@pytest.mark.spark
def test_parse_urlset(spark):
    df = spark.createDataFrame([("h.example", XML)], "host string, xml string")
    got = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    # whitespace-trimmed loc; explicit priority in exact ppm
    assert got["https://h.example/a"]["lastmod"] == "2026-05-01"
    assert got["https://h.example/a"]["priority_ppm"] == 700_000
    # missing lastmod -> NULL, missing priority -> spec default
    assert got["https://h.example/b"]["lastmod"] is None
    assert got["https://h.example/b"]["priority_ppm"] == SITEMAP_DEFAULT_PRIORITY_PPM
    # XML entities decoded; junk priority falls back to the default
    e = got["https://h.example/p?a=1&b=2"]
    assert e["priority_ppm"] == SITEMAP_DEFAULT_PRIORITY_PPM
    # numeric character references decode too (decimal and hex forms)
    assert "https://h.example/q?x=1&y=2&z=3" in got
    # loc-less entry dropped
    assert len(got) == 4


@pytest.mark.spark
def test_parse_index(spark):
    df = spark.createDataFrame([("h.example", IDX)], "host string, xml string")
    got = {r["child_loc"]: r["lastmod"] for r in parse_sitemap_index(df).collect()}
    assert got == {
        "https://h.example/s1.xml.gz": "2026-04-01",
        "https://h.example/s2.xml": None,
    }


@pytest.mark.spark
def test_synth_roundtrip(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source")
    )
    out = parse_sitemaps(synth_sitemaps(docs)).collect()
    assert len(out) == 100  # every doc yields exactly one entry
    by_loc = {r["loc"]: r for r in out}
    r9 = by_loc["https://src1.example.com/p/9"]
    assert r9["lastmod"] == "2026-01-10" and r9["priority_ppm"] == 100_000
    r4 = by_loc["https://src0.example.com/p/4"]
    assert r4["lastmod"] is None and r4["priority_ppm"] == SITEMAP_DEFAULT_PRIORITY_PPM
