"""Flagship EP2 plan vs a pure-Python oracle re-execution of the
reference's per-WARC pipeline (src/warc_processor.py:283-380)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from urllib.parse import urlparse

from crawler_spark.oracle import detect as oracle_detect
from crawler_spark.plans.flagship import (
    classify_bulk,
    count_by_confidence,
    stats_rollup,
    top_domains,
)
from crawler_spark.sources.corpus import generate_pages

N = 2500


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N, num_warcs=6).cache()
    df.count()
    yield df
    df.unpersist()


def oracle_ep2(rows, sample_per_warc=None):
    """Reference EP2 control flow, row at a time, over collected pages."""
    by_warc: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r["warc_offset"]):
        by_warc.setdefault(r["warc_source"], []).append(r)
    out = []
    for warc, recs in by_warc.items():
        if sample_per_warc is not None:
            recs = recs[:sample_per_warc]
        found_in_this_warc = set()
        for r in recs:
            if r["rec_type"] != "response":
                continue
            text = r["text"]
            if "html" not in text[:1000].lower():  # content sniff (:266-271)
                continue
            d = oracle_detect(text, r["url"])
            if d["is_nextjs"] and d["confidence"] in ("high", "medium"):
                if r["url"] not in found_in_this_warc:  # per-WARC dedupe (:360)
                    found_in_this_warc.add(r["url"])
                    p = urlparse(r["url"])
                    out.append(
                        {
                            "domain": p.netloc,
                            "url": r["url"],
                            "schema": p.scheme,
                            "confidence": d["confidence"],
                            "indicators": tuple(d["indicators"]),
                            "build_id": d["build_id"],
                            "version": d["version"],
                            "warc_source": warc,
                        }
                    )
    return out


@pytest.mark.spark
def test_flagship_matches_oracle(spark, pages):
    got_rows = classify_bulk(pages).collect()
    got = {
        (
            r["domain"], r["url"], r["schema"], r["confidence"],
            tuple(r["indicators"]), r["build_id"], r["version"], r["warc_source"],
        )
        for r in got_rows
    }
    expect_rows = oracle_ep2(pages.collect())
    expect = {
        (
            e["domain"], e["url"], e["schema"], e["confidence"],
            e["indicators"], e["build_id"], e["version"], e["warc_source"],
        )
        for e in expect_rows
    }
    assert len(got_rows) == len(expect_rows)  # dedupe cardinality identical
    assert got == expect


@pytest.mark.spark
def test_flagship_head_sample_matches_oracle(spark, pages):
    k = 40
    got = {
        (r["url"], r["warc_source"])
        for r in classify_bulk(pages, sample_per_warc=k).collect()
    }
    expect = {(e["url"], e["warc_source"]) for e in oracle_ep2(pages.collect(), k)}
    assert got == expect


@pytest.mark.spark
def test_global_vs_per_warc_dedupe(spark, pages):
    per_warc = classify_bulk(pages, dedupe="per_warc")
    global_ = classify_bulk(pages, dedupe="global")
    n_pw, n_g = per_warc.count(), global_.count()
    # planted cross-WARC dups ⇒ global strictly dedupes more (or equal)
    assert n_g <= n_pw
    assert global_.select("url").distinct().count() == n_g


@pytest.mark.spark
def test_aggregations(spark, pages):
    res = classify_bulk(pages).cache()
    stats = stats_rollup(res).collect()[0]
    assert stats["nextjs_found"] == res.count()
    byconf = {r["confidence"]: r["n"] for r in count_by_confidence(res).collect()}
    assert set(byconf) <= {"high", "medium"}
    assert sum(byconf.values()) == stats["nextjs_found"]
    top = top_domains(res, 5).collect()
    assert len(top) <= 5
    assert all(top[i]["n"] >= top[i + 1]["n"] for i in range(len(top) - 1))
    res.unpersist()


@pytest.mark.spark
def test_scan_prunes_html_column(spark, pages, tmp_path):
    """The flagship plan over a parquet table must NOT read `html` —
    column pruning is the Range-request analog (SURVEY §4)."""
    p = str(tmp_path / "pages_pq")
    pages.write.parquet(p)
    plan = classify_bulk(spark.read.parquet(p))._jdf.queryExecution().executedPlan().toString()
    assert "html" not in plan.split("ReadSchema")[-1][:2000]
