"""Crawler-trap detection: URL template explosion per host.

Calendars, session ids, faceted search and infinite pagination mint
unbounded URL spaces under one path shape — the classic crawler trap.
The standard detector (public knowledge from every production crawler,
e.g. Heritrix's path-repetition rules): collapse each URL path to a
TEMPLATE (digit runs → ``N``, long hex runs → ``H``), count URLs per
(host, template), and flag templates minting far more URLs than the
host's typical shape (mean template size, integer-exact — a median
would cross engines through double→int casts with different rounding
rules). The frontier then demotes or caps matching URLs — this feeds
the same admission path as the politeness budget.

Scale shape: template extraction is chained JVM ``regexp_replace`` (no
Python); the per-(host, template) count is ONE partial-agg group-by;
the per-host median is computed over the already-aggregated template
rows (hosts × templates ≪ URLs), so the expensive pass over raw URLs
is a single map+combine. Integer ratio in parts-per-million.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
TRAP_MIN_URLS = 2  # a template needs this many URLs to be suspect
TRAP_RATIO_PPM = 4 * PPM  # ≥4x the host's mean template size


def url_template(url_col) -> F.Column:
    """Path shape: strip scheme+host, digit runs → N, ≥8-char hex runs
    → H, then drop the query string entirely."""
    path = F.regexp_replace(url_col, r"(?i)^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.regexp_replace(path, r"\?.*$", "")
    path = F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "H")
    return F.regexp_replace(path, r"[0-9]+", "N")


def trap_detect(
    pages: DataFrame,
    min_urls: int = TRAP_MIN_URLS,
    ratio_ppm: int = TRAP_RATIO_PPM,
) -> DataFrame:
    """(host, template, n_urls, mean_n, ratio_ppm, is_trap) per
    (host, template) with ≥ ``min_urls`` URLs. Input: (url, host)."""
    t = pages.select(
        "host", url_template(F.col("url")).alias("template")
    )
    counts = t.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    mean = counts.groupBy("host").agg(
        F.expr("sum(n_urls) div count(*)").alias("mean_n")
    )
    r = F.expr(f"(n_urls * {PPM}) div mean_n")
    return (
        counts.join(mean, "host")
        .where(F.col("n_urls") >= min_urls)
        .select(
            "host",
            "template",
            "n_urls",
            "mean_n",
            r.alias("ratio_ppm"),
            (r >= ratio_ppm).alias("is_trap"),
        )
    )


def synth_trap_urls(docs: DataFrame) -> DataFrame:
    """(url, host) with a planted trap: on hosts with g%5==0, two of
    every three docs (row-in-source mod 3 ≠ 2) mint a distinct
    calendar-style URL under ONE template while the rest spread over
    10 section templates — so the trap template dwarfs the host's own
    mean."""
    g = F.regexp_extract("source", r"(\d+)$", 1).cast("int")
    trap_url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/calendar/2026/"),
        (F.col("doc_id") % 12 + 1).cast("string"),
        F.lit("/day-"), F.col("doc_id").cast("string"),
    )
    # section keys must be LETTERS (the digit collapse would merge
    # numbered sections into one template) and keyed on the doc's row
    # index WITHIN its source — doc ids of one source are congruent
    # mod 20, so any doc_id % k with k | 20 is constant per host
    normal_url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/section-"),
        F.expr("substr('abcdefghij', CAST((doc_id div 20) % 10 AS INT) + 1, 1)"),
        F.lit("/page-"), F.col("doc_id").cast("string"),
    )
    row_in_source = F.expr("doc_id div 20")
    # 2/3 of a trap host's docs fall into the calendar template: the
    # explosion ratio converges to ~7.3x, comfortably past the 4x gate
    # at every SF where the host has enough rows to matter
    return docs.select(
        F.when((g % 5 == 0) & (row_in_source % 3 != 2), trap_url)
        .otherwise(normal_url)
        .alias("url"),
        F.concat("source", F.lit(".example.com")).alias("host"),
    )
