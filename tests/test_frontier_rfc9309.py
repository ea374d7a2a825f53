"""Frontier robots_mode='rfc9309': full wildcard Allow/Disallow gating
inside the BFS loop, differentially against the reference-parity
prefix mode on the same robots body."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crawler_spark.config import EngineConfig, PolitenessConfig
from crawler_spark.frontier import FrontierCrawler
from crawler_spark.functions.robots_parse import (
    robots_from_bodies,
    robots_rfc9309_from_bodies,
)
from crawler_spark.sources.tables import SnapshotStore

CFG = EngineConfig(
    num_host_buckets=4,
    skew_threshold=200,
    skew_salts=2,
    max_retry_attempts=2,
    politeness=PolitenessConfig(rate_per_s=2.0, burst=5, round_duration_s=30),
)

BODY = "User-agent: *\nDisallow: /d/1*\nAllow: /d/1$\nCrawl-delay: 1\n"
URLS = [f"https://h.com/d/{i}" for i in (1, 10, 12, 2)]


def _pages(spark):
    ts = dt.datetime(2026, 1, 1)
    rows = [
        (u, ts, b"", "hello words", "en", "w0", i, "text/html", 200, "response")
        for i, u in enumerate(URLS)
    ]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string, "
        "warc_source string, warc_offset bigint, mime string, status int, "
        "rec_type string",
    )


def _crawl(spark, tmp_path, name, robots, mode):
    pages = _pages(spark)
    seeds = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "seed_id int, url string"
    )
    store = SnapshotStore(str(tmp_path / name))
    c = FrontierCrawler(
        spark, store, pages, links=None, robots=robots, cfg=CFG,
        budget=10, robots_mode=mode,
    )
    c.init_from_seeds(seeds)
    metrics = c.run(1, from_round=0)
    fetched = {
        r["url"]
        for r in store.read(spark, "url_seen")
        .join(pages.select("url").distinct(), "url", "left_semi")
        .collect()
    }
    return fetched, metrics


@pytest.mark.spark
def test_rfc9309_mode_honors_allow_and_anchor(spark, tmp_path):
    bodies = spark.createDataFrame([("h.com", BODY)], "host string, robots_txt string")
    rules = robots_rfc9309_from_bodies(bodies)
    fetched, metrics = _crawl(spark, tmp_path, "rfc", rules, "rfc9309")
    # Allow /d/1$ wins its length tie against Disallow /d/1* -> /d/1
    # fetched; /d/10 and /d/12 blocked by the wildcard; /d/2 untouched
    assert fetched == {"https://h.com/d/1", "https://h.com/d/2"}
    assert metrics[0].blocked == 2


@pytest.mark.spark
def test_prefix_mode_treats_wildcard_literally(spark, tmp_path):
    # the SAME body through the reference-parity prefix gate: Allow is
    # ignored and '/d/1*' is a LITERAL prefix (no path starts with a
    # literal '*'), so the rule is inert and everything is fetched —
    # exactly why the rfc9309 mode exists for wildcard-bearing robots
    bodies = spark.createDataFrame([("h.com", BODY)], "host string, robots_txt string")
    rules = robots_from_bodies(bodies)
    fetched, _ = _crawl(spark, tmp_path, "pfx", rules, "prefix")
    assert fetched == set(URLS)


@pytest.mark.spark
def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        FrontierCrawler(
            spark, SnapshotStore(str(tmp_path / "x")), _pages(spark),
            robots_mode="nonsense",
        )


@pytest.mark.spark
def test_mode_table_shape_mismatch_fails_fast(spark, tmp_path):
    bodies = spark.createDataFrame([("h.com", BODY)], "host string, robots_txt string")
    prefix_table = robots_from_bodies(bodies)
    rfc_table = robots_rfc9309_from_bodies(bodies)
    with pytest.raises(ValueError, match="rules"):
        FrontierCrawler(
            spark, SnapshotStore(str(tmp_path / "m1")), _pages(spark),
            robots=prefix_table, robots_mode="rfc9309",
        )
    with pytest.raises(ValueError, match="disallow_prefixes"):
        FrontierCrawler(
            spark, SnapshotStore(str(tmp_path / "m2")), _pages(spark),
            robots=rfc_table, robots_mode="prefix",
        )
