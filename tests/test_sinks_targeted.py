"""Sinks (JSON/CSV/failures export + resume source) and the EP1 targeted
plan (CDX predicates, per-domain head-k, end-to-end classify)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.flagship import classify_bulk
from crawler_spark.plans.targeted import (
    cdx_from_pages,
    cdx_search,
    per_domain_search,
    targeted_search,
)
from crawler_spark.sources.corpus import generate_pages
from crawler_spark.sources.sinks import (
    CSV_COLS_BULK,
    load_failures,
    write_failures,
    write_results_csv,
    write_results_json,
)

N = 2000


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N, partitions=4).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def results(spark, pages):
    df = classify_bulk(pages, min_confidence="medium").cache()
    df.count()
    yield df
    df.unpersist()


# ------------------------------------------------------------------ sinks --


@pytest.mark.spark
def test_json_sink_roundtrip(spark, results, tmp_path):
    p = str(tmp_path / "res_json")
    write_results_json(results, p, single_file=True)
    back = spark.read.json(p)
    assert back.count() == results.count()
    assert set(back.columns) >= {"domain", "url", "confidence", "warc_source"}


@pytest.mark.spark
def test_csv_sink_reference_columns(spark, results, tmp_path):
    p = str(tmp_path / "res_csv")
    write_results_csv(results, p, single_file=True)
    import glob

    f = glob.glob(f"{p}/*.csv")[0]
    header = open(f).readline().strip().split(",")
    assert header == [c for c in CSV_COLS_BULK if c in results.columns]
    # indicators flattened with the reference's '; ' join
    body = open(f).read()
    assert "; " in body


@pytest.mark.spark
def test_failure_sink_and_resume(spark, tmp_path):
    fails = spark.createDataFrame(
        [("http://a/x", "timeout", 2), ("http://b/y", "connection_error", 1)],
        "url string, failure_reason string, failure_count int",
    )
    jp, tp = str(tmp_path / "f_json"), str(tmp_path / "f_txt")
    write_failures(fails, jp, tp, single_file=True)

    from_json = {r["url"] for r in load_failures(spark, jp).collect()}
    from_txt = {r["url"] for r in load_failures(spark, tp).collect()}
    assert from_json == from_txt == {"http://a/x", "http://b/y"}

    import glob

    jf = glob.glob(f"{jp}/*.json")[0]
    rec = json.loads(open(jf).readline())
    assert rec["failure_reason"] in {"timeout", "connection_error"}


# --------------------------------------------------------------- targeted --


@pytest.mark.spark
def test_cdx_projection_fields(spark, pages):
    cdx = cdx_from_pages(pages)
    row = cdx.where(F.col("urlkey").isNotNull()).orderBy("urlkey").first()
    assert row["ts"] and len(row["ts"]) == 14 and row["ts"].startswith("2026")
    assert row["urlkey"].split(")")[0].count(",") >= 1  # reversed host labels
    assert row["filename"].startswith("crawl-data/")


@pytest.mark.spark
def test_match_predicates(spark, pages):
    cdx = cdx_from_pages(pages).cache()
    host = cdx.where(F.col("host").isNotNull()).first()["host"]
    exact_key = cdx.where(F.col("host") == host).first()["urlkey"]

    assert cdx_search(cdx, exact_key, "exact", filter_status=None).count() >= 1
    prefix_n = cdx_search(
        cdx, exact_key.split(")")[0] + ")", "prefix", filter_status=None
    ).count()
    host_n = cdx_search(cdx, host, "host", filter_status=None).count()
    assert prefix_n == host_n  # same host ⇒ same SURT prefix
    # domain match covers subdomains
    parts = host.split(".")
    apex = ".".join(parts[-2:])
    dom_n = cdx_search(cdx, apex, "domain", filter_status=None).count()
    assert dom_n >= host_n
    # status filter
    assert (
        cdx_search(cdx, apex, "domain", filter_status=200)
        .where(F.col("status") != 200)
        .count()
        == 0
    )
    cdx.unpersist()


@pytest.mark.spark
def test_per_domain_headk_cap(spark, pages):
    cdx = cdx_from_pages(pages)
    domains = cdx.select(F.col("host").alias("domain")).distinct().limit(20)
    out = per_domain_search(pages, domains, limit_per_domain=3)
    per = out.groupBy("domain").count().agg(F.max("count")).collect()[0][0]
    assert per is not None and per <= 3


@pytest.mark.spark
def test_targeted_end_to_end_global_dedupe(spark, pages):
    host = cdx_from_pages(pages).where(F.col("host").isNotNull()).first()["host"]
    apex = ".".join(host.split(".")[-2:])
    res = targeted_search(pages, apex, "domain", min_confidence="low")
    rows = res.collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))  # EP1 global-URL dedupe
    for r in rows:
        assert r["domain"] == apex or r["domain"].endswith("." + apex)
