"""Corpus curation ABOVE the document level: URL blocklist filtering and
host reputation scoring.

At 100 TB the cheapest quality lever runs before any per-document
work: drop whole hosts and URL shapes first (UT1-style domain
blocklists and path patterns — the RefinedWeb/FineWeb recipe), then
score the surviving hosts from aggregate signals so the next crawl
round can de-prioritize low-reputation domains. Both stages move
(url, host)-sized rows, never bodies.

Scale shape:
- ``url_category_filter``: the blocklist is hosts-sized → broadcast
  hash join (LEFT, null-tag = not listed); the path patterns compile
  into ONE JVM regex per row — no Python, no shuffle at all.
- ``host_reputation``: one partial-agg group-by on host (map-side
  combine); the verdict is pure column arithmetic on the aggregate
  row. Integer parts-per-million throughout — no float drift between
  engines, and thresholds stay exact at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000

# path shapes dropped regardless of host (UT1-style category patterns)
BLOCK_PATH_PATTERN = r"/d/[0-9]*13$"

# reputation thresholds (parts-per-million of a host's docs)
REP_SHORT_MAX_PPM = 150_000  # >15% short docs → block
REP_NONEN_REVIEW_PPM = 600_000  # >60% non-English → review
REP_SHORT_CHARS = 100


def url_category_filter(
    pages: DataFrame, blocklist: DataFrame, path_pattern: str = BLOCK_PATH_PATTERN
) -> DataFrame:
    """(url, host, keep, reason) — reason ∈ domain_blocklist |
    path_pattern | ok, domain taking precedence. ``blocklist`` is a
    1-column (host) table, broadcast."""
    # real UT1 lists repeat domains across category files — dedupe so
    # the LEFT join stays one-row-per-URL
    b = F.broadcast(blocklist.select(F.col("host").alias("_bh")).distinct())
    j = pages.select("url", "host").join(b, F.col("host") == F.col("_bh"), "left")
    reason = (
        F.when(F.col("_bh").isNotNull(), "domain_blocklist")
        .when(F.col("url").rlike(path_pattern), "path_pattern")
        .otherwise("ok")
    )
    return j.select(
        "url",
        "host",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def host_reputation(docs: DataFrame) -> DataFrame:
    """(host, n_docs, short_ppm, nonen_ppm, avg_chars, verdict) from
    (host, lang, n_chars) rows; verdict ∈ allow | review | block."""
    agg = docs.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_chars") < REP_SHORT_CHARS).cast("long")).alias("_short"),
        F.sum((F.col("lang") != "en").cast("long")).alias("_nonen"),
        F.sum("n_chars").alias("_chars"),
    )
    short_ppm = F.expr(f"(_short * {PPM}) div n_docs")
    nonen_ppm = F.expr(f"(_nonen * {PPM}) div n_docs")
    return agg.select(
        "host",
        "n_docs",
        short_ppm.alias("short_ppm"),
        nonen_ppm.alias("nonen_ppm"),
        F.expr("_chars div n_docs").alias("avg_chars"),
        F.when(short_ppm > REP_SHORT_MAX_PPM, "block")
        .when(nonen_ppm > REP_NONEN_REVIEW_PPM, "review")
        .otherwise("allow")
        .alias("verdict"),
    )


def synth_blocklist(docs: DataFrame) -> DataFrame:
    """Deterministic UT1-style domain blocklist: every 10th source."""
    return (
        docs.select("source")
        .distinct()
        .where(F.regexp_extract("source", r"(\d+)$", 1).cast("int") % 10 == 7)
        .select(F.concat("source", F.lit(".example.com")).alias("host"))
    )


def docs_with_host(docs: DataFrame) -> DataFrame:
    """documents → (host, lang, n_chars) for reputation scoring."""
    return docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        "lang",
        "n_chars",
    )
