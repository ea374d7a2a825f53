"""WARC revisit records + sitemap-driven recrawl staleness.

Two storage-layer crawl operators over the multi-capture store:

**Revisit marking** — the WARC 1.1 ``revisit`` record type with the
``identical-payload-digest`` profile (ISO 28500 / IIPC spec, public):
when a recrawl fetches a page whose payload digest matches an EARLIER
capture of the same URL, the store writes a tiny revisit record instead
of the body — Common Crawl and the Wayback Machine both rely on this
for recrawl storage dedup, and CDX rows carry the digest precisely so
readers can resolve revisits to the original capture. Spark shape: ONE
window over (url, digest) ordered by ts — ``row_number() > 1`` is a
revisit. Partition groups are per-(url, digest), tiny everywhere, so
there is no skew risk even for mega-hosts; the rollup after it is a
partial-agg group-by.

**Sitemap staleness** — compose the sitemap ``lastmod`` advertisement
(sources/sitemap.py) with the store's latest capture per URL: a page
whose advertised lastmod postdates its newest capture needs a refetch;
a page without lastmod is unknown (crawl on its change-rate schedule,
operators/crawlreport.py). This is the conditional-fetch planner that
saves the fetch itself — the cheapest request is the one not made.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.asof import synth_captures


def mark_revisits(captures: DataFrame) -> DataFrame:
    """(url, ts, digest, n_bytes) → + is_revisit. A capture is a
    revisit iff an earlier capture of the same url has the same digest
    (the identical-payload-digest profile)."""
    w = Window.partitionBy("url", "digest").orderBy("ts")
    return captures.withColumn("is_revisit", F.row_number().over(w) > 1)


def revisit_savings(captures: DataFrame) -> DataFrame:
    """Per-host storage ledger: captures, revisits, bytes actually
    stored vs bytes the revisit records saved."""
    m = mark_revisits(captures)
    return m.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum(F.col("is_revisit").cast("long")).alias("n_revisits"),
        F.sum(F.when(~F.col("is_revisit"), F.col("n_bytes")).otherwise(0)).alias(
            "bytes_stored"
        ),
        F.sum(F.when(F.col("is_revisit"), F.col("n_bytes")).otherwise(0)).alias(
            "bytes_saved"
        ),
    )


def sitemap_staleness(sitemap_rows: DataFrame, captures: DataFrame) -> DataFrame:
    """sitemap rows (host, loc, lastmod) ⋈ latest capture per url →
    per-host recrawl plan: listed URLs, never-captured URLs, URLs whose
    advertised lastmod postdates the newest capture (stale → refetch),
    and lastmod-less URLs (unknown → schedule-driven)."""
    latest = captures.groupBy(F.col("url").alias("loc")).agg(
        F.max("ts").alias("last_ts")
    )
    j = sitemap_rows.join(latest, "loc", "left")
    stale = F.col("lastmod").isNotNull() & (
        F.to_date("lastmod") > F.to_date("last_ts")
    )
    return j.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_listed"),
        F.sum(F.col("last_ts").isNull().cast("long")).alias("n_uncaptured"),
        F.sum((F.col("last_ts").isNotNull() & stale).cast("long")).alias("n_stale"),
        F.sum(F.col("lastmod").isNull().cast("long")).alias("n_unknown"),
    )


# Closed-form capture store WITH planted revisits: asof.synth_captures
# with even docs' third capture (k=2) repeating the k=0 digest — the
# page didn't change, so the recrawl stores a revisit.
def synth_revisit_captures(docs: DataFrame) -> DataFrame:
    dk = F.when(
        (F.col("doc_id") % 2 == 0) & (F.col("k") == 2), F.lit(0)
    ).otherwise(F.col("k"))
    return synth_captures(docs, digest_k=dk, with_bytes=True)
