"""Frontier expansion driven by outlinks() — the full page→href→
frontier path (functions/links.py feeding frontier.FrontierCrawler).

The existing frontier suite consumes a pre-built links table; this one
derives it from anchor-tag HTML (absolute, relative and dot-segment
hrefs plus mailto noise) and asserts BFS discovers exactly the
link-reachable pages, with cycles terminated by URL-seen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.config import EngineConfig, PolitenessConfig
from crawler_spark.frontier import FrontierCrawler
from crawler_spark.functions.links import outlinks
from crawler_spark.sources.corpus import generate_pages
from crawler_spark.sources.tables import SnapshotStore

N_PAGES = 12
CFG = EngineConfig(
    num_host_buckets=4,
    skew_threshold=200,
    skew_salts=2,
    max_retry_attempts=2,
    politeness=PolitenessConfig(rate_per_s=2.0, burst=5, round_duration_s=30),
)


@pytest.mark.spark
def test_frontier_expands_from_html_anchors(spark, tmp_path):
    pages = generate_pages(spark, N_PAGES, num_warcs=2).cache()
    urls = [r["url"] for r in pages.select("url").orderBy("url").collect()]

    # chain 0→1→2→3→4 via mixed href styles; 4 links back to 0 (cycle);
    # the rest of the corpus is unlinked and must stay unseen
    def page_html(i: int) -> str:
        if i >= 5:
            return "<html><body>no links here</body></html>"
        nxt = urls[(i + 1) % 5]
        # alternate absolute and root-relative+dot-segment refs — the
        # resolver must reconstruct the absolute URL either way
        if i % 2 == 0:
            href = nxt
        else:
            from urllib.parse import urlsplit

            p = urlsplit(nxt)
            href = f"/x/../{p.path.lstrip('/')}" + (f"?{p.query}" if p.query else "")
            # only valid when src and dst share a host; fall back to abs
            if urlsplit(urls[i]).netloc != p.netloc:
                href = nxt
        return (
            f'<html><body><a href="{href}">n</a>'
            '<a href="mailto:x@y">m</a></body></html>'
        )

    html_pages = spark.createDataFrame(
        [(urls[i], page_html(i)) for i in range(N_PAGES)], "url string, html string"
    )
    links = outlinks(html_pages).cache()
    links.count()

    seeds = spark.createDataFrame([(0, urls[0])], "seed_id int, url string")
    store = SnapshotStore(str(tmp_path / "olk"))
    crawler = FrontierCrawler(
        spark, store, pages, links=links, robots=None, cfg=CFG, budget=10
    )
    crawler.init_from_seeds(seeds)
    metrics = crawler.run(6, from_round=0)

    fetched = {
        r["url"]
        for r in store.read(spark, "url_seen")
        .join(pages.select("url").distinct(), "url", "left_semi")
        .collect()
    }
    assert fetched == set(urls[:5])  # exactly the link-reachable chain
    # the cycle edge 4→0 must not re-schedule page 0
    total_admitted = sum(m.admitted for m in metrics)
    assert total_admitted == 5
    pages.unpersist()
    links.unpersist()
