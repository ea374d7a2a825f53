"""CDX ``collapse`` — capture-stream thinning, the index-server side
of recrawl dedup.

The public CDX server API (pywb / Common Crawl's index server; the
reference's client hits the same endpoints, src/cdx/client.py:88-101,
but never passes ``collapse``) supports thinning the per-URL capture
stream at query time:

- ``collapse=digest``: walking each urlkey's captures in time order,
  drop a capture whose payload digest equals the immediately preceding
  capture's digest — ADJACENT dedup, not global (an A→B→A flip keeps
  all three rows). The replay view of "what changed".
- ``collapse=timestamp:N``: keep only the first capture per urlkey per
  distinct N-digit timestamp prefix (N=8 → one per day, N=10 → one per
  hour). The sampling view ("daily snapshots").

Spark shapes, chosen per 100 TB scale rules:

- digest-collapse is ONE ``lag`` window partitioned by urlkey — groups
  are per-URL capture lists (tiny everywhere, mega-hosts included, so
  no skew risk), and the single shuffle keys on urlkey, the same
  partitioning the CDX store is already sorted by (sources/cdxsink.py
  range-shards on urlkey — on a sorted store this window is
  shuffle-free under storage-partitioned reads).
- timestamp-collapse needs NO window at all: because the prefix is
  monotone in ``ts``, "first per adjacent prefix run" ≡ "min per
  (urlkey, prefix) group", so it is a ``min_by`` partial aggregate —
  map-side combine reduces every partition to one candidate per group
  before the one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_digest(
    cdx: DataFrame,
    key: str = "urlkey",
    ts: str = "ts",
    digest: str = "digest",
) -> DataFrame:
    """``collapse=digest``: drop captures whose digest equals the
    previous capture's digest for the same urlkey (time order; ``url``
    breaks duplicate-timestamp ties deterministically)."""
    order = [F.col(ts)] + ([F.col("url")] if "url" in cdx.columns else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(digest)).over(w)
    return (
        cdx.withColumn("_prev_digest", prev)
        .where(F.col("_prev_digest").isNull() | (F.col("_prev_digest") != F.col(digest)))
        .drop("_prev_digest")
    )


def collapse_timestamp(
    cdx: DataFrame,
    digits: int,
    key: str = "urlkey",
    ts: str = "ts",
    payload: tuple[str, ...] | None = None,
) -> DataFrame:
    """``collapse=timestamp:digits``: first capture per urlkey per
    distinct ``digits``-long timestamp prefix.

    ``ts`` is the 14-digit CDX timestamp string. Equivalent to the
    adjacent-first walk because the prefix is monotone in ts, but
    executed as a partial aggregate (``min_by``) instead of a window —
    no per-group sort, map-side combine does most of the work.
    ``payload`` defaults to whichever of (ts, url, digest) the frame
    carries — url-less CDX projections are supported, same as
    :func:`collapse_digest`.
    """
    if payload is None:
        payload = tuple(c for c in (ts, "url", "digest") if c in cdx.columns)
    row = F.struct(*[F.col(c) for c in payload])
    ordk = F.struct(F.col(ts), *([F.col("url")] if "url" in cdx.columns else []))
    return (
        cdx.groupBy(F.col(key), F.substring(F.col(ts), 1, digits).alias("_pre"))
        .agg(F.min_by(row, ordk).alias("_r"))
        .select(key, *[F.col(f"_r.{c}").alias(c) for c in payload])
    )
