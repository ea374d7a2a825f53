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
def test_rfc9309_full_loop_matches_oracle(spark, tmp_path):
    """Full-loop ordering equality in rfc9309 mode: multi-round BFS with
    links, wildcard/anchor/Allow rules and crawl-delays, compared
    round-by-round against the pure-Python oracle
    (tests/oracle_crawl.oracle_crawl with robots_mode='rfc9309') — the
    same contract test_frontier runs for the prefix gate. This is what
    lets the rfc9309 mode carry the same evidence as the default."""
    import zlib

    from crawler_spark.functions.robots_parse import RULES_TYPE
    from crawler_spark.sources.corpus import (
        generate_links,
        generate_pages,
        generate_seeds,
    )
    from tests.oracle_crawl import oracle_crawl

    n_pages, n_seeds, budget, rounds = 400, 25, 6, 3
    pages = generate_pages(spark, n_pages, num_warcs=3).cache()
    links = generate_links(spark, n_pages, avg_fanout=3).cache()
    seeds = generate_seeds(spark, n_seeds, n_pages).cache()

    # deterministic per-host wildcard rule sets — the SAME input rows
    # feed the Spark gate (as a rules table) and the oracle (as a dict);
    # the two sides then MATCH them independently (JVM LIKE fold vs the
    # oracle's regex reference)
    from crawler_spark.functions.url import canonicalize_udf

    hosts = sorted(
        r["host"]
        for r in pages.select(canonicalize_udf("url")["host"].alias("host"))
        .where(F.col("host").isNotNull())
        .distinct()
        .collect()
    )
    rule_rows, robot_map = [], {}
    for h in hosts:
        hv = zlib.crc32(h.encode())
        if hv % 3 == 0:
            rules = [("/p/1*", False), ("/p/12*", True)]
        elif hv % 3 == 1:
            rules = [("/p/*3$", False)]
        else:
            rules = []
        delay = float(hv % 4 + 1) if hv % 5 == 0 else None
        rule_rows.append((h, rules, delay))
        robot_map[h] = (rules, delay)
    rules_df = spark.createDataFrame(
        rule_rows, f"host string, rules {RULES_TYPE.replace('array', 'array', 1)}, crawl_delay double"
    )

    store = SnapshotStore(str(tmp_path / "rfc_loop"))
    crawler = FrontierCrawler(
        spark, store, pages, links=links, robots=rules_df, cfg=CFG,
        budget=budget, robots_mode="rfc9309",
    )
    crawler.init_from_seeds(seeds)
    metrics = crawler.run(rounds, from_round=0)

    page_urls = {r["url"] for r in pages.select("url").distinct().collect()}
    link_map: dict[str, list] = {}
    for r in links.collect():
        link_map.setdefault(r["src_url"], []).append(r["dst_url"])
    seed_list = [(r["seed_id"], r["url"]) for r in seeds.orderBy("seed_id").collect()]
    schedules, seen_expect, _ = oracle_crawl(
        seed_list, page_urls, link_map, robot_map, budget,
        CFG.max_retry_attempts, rounds, robots_mode="rfc9309",
    )

    seen = store.read(spark, "url_seen")
    assert {r["surt"] for r in seen.collect()} == seen_expect
    # per-round ordering contract: the sealed (host, surt) sequence per
    # round equals the oracle's admitted-minus-retryable set, ordered
    for rnd, sched in enumerate(schedules, start=1):
        assert metrics[rnd - 1].admitted == len(sched), f"round {rnd}"
        got = sorted(
            (r["host"], r["surt"])
            for r in seen.where(F.col("round") == rnd).collect()
        )
        expect_sealed = sorted(
            (c.host, c.surt)
            for c in sched
            if c.url in page_urls
            or c.failure_count + 1 >= CFG.max_retry_attempts
        )
        assert got == expect_sealed, f"round {rnd} sealed order"
    # the wildcard gate must actually bite in-loop (not a vacuous pass)
    assert sum(m.blocked for m in metrics) > 0
    crawler.close()
    for df in (pages, links, seeds):
        df.unpersist()


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
