"""Time-travel lookups over a multi-capture crawl store: as-of join
and CDX ``closest``-timestamp selection.

A crawl store holds many captures per URL ``(urlkey, ts)``. The two
standard time-travel lookups over it (public CDX-server / pywb
semantics — the ``closest=TS`` query param and wayback replay):

- **as-of** ("what did URL *u* look like at time *t*"): the latest
  capture with ``ts <= t`` — replay semantics; DuckDB's native
  ``ASOF JOIN`` is the oracle.
- **closest** (CDX ``sort=closest``): the capture minimizing
  ``|ts - t|`` per urlkey, earlier capture winning ties.

The reference's CDX client exposes exact/prefix/host/domain match,
status filter and from/to bounds (src/cdx/client.py:88-101) but not
the time-travel family; an incremental-crawl analytics engine needs
both (recrawl_report diffs two snapshots — asof_join picks WHICH
snapshot pair to diff for an arbitrary point in time).

Scale shape (10^10-capture store):
- ``closest`` is ONE partial-aggregate group-by — ``min_by`` with a
  struct ordering key, so map-side combine reduces every partition to
  one candidate per urlkey before the single shuffle. No window, no
  per-key sort.
- ``asof_join`` is the textbook union-merge: captures and probes are
  unioned, shuffled ONCE on the key, time-sorted per key, and the
  answer is a running ``last(ignorenulls)`` — every probe reads the
  nearest preceding capture in a single pass. No range-condition
  theta join (which Spark would execute as BroadcastNestedLoopJoin)
  and no per-key loop. A cogrouped ``applyInPandas`` +
  ``pd.merge_asof`` would be the fallback if the carried capture
  payload were too wide to move through a window; here the payload is
  a couple of columns, so the JVM-codegen window wins (no Arrow
  transfer at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdx_closest(cdx: DataFrame, target_ts: str, payload: tuple[str, ...] = ("ts", "url", "digest")) -> DataFrame:
    """Per urlkey, the capture closest in time to the 14-digit
    ``target_ts`` (ties → earlier capture, then smaller url).

    ``cdx`` is the R1 projection (plans/targeted.cdx_from_pages):
    urlkey + 14-digit string ``ts`` + capture columns.
    """
    t = int(target_ts)
    dist = F.abs(F.col("ts").cast("long") - F.lit(t))
    ordk = F.struct(dist.alias("d"), F.col("ts"), F.col("url"))
    row = F.struct(*[F.col(c) for c in payload])
    return (
        cdx.where(F.col("urlkey").isNotNull())
        .groupBy("urlkey")
        .agg(F.min_by(row, ordk).alias("_r"))
        .select("urlkey", *[F.col(f"_r.{c}").alias(c) for c in payload])
    )


def asof_join(
    probes: DataFrame,
    captures: DataFrame,
    key: str = "url",
    probe_ts: str = "t",
    cap_ts: str = "ts",
    payload: tuple[str, ...] = ("digest",),
) -> DataFrame:
    """For every probe row ``(key, t)``, the capture with the largest
    ``ts <= t`` for the same key — NULL payload when none precedes.

    Union-merge: one shuffle on ``key``, one per-key time sort shared
    by the running ``last(ignorenulls)``; captures sort before probes
    at equal timestamps so the join is inclusive (``<=``).
    """
    val = F.struct(F.col(cap_ts).alias("_cap_ts"), *[F.col(c) for c in payload])
    c = captures.select(
        F.col(key).alias("_k"),
        F.col(cap_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        val.alias("_v"),
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(c.schema["_v"].dataType).alias("_v"),
    )
    # ordering by _v last makes equal-(ts,side) capture runs a total
    # order, so last() is deterministic even with duplicate capture
    # timestamps per key
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        c.unionByName(p)
        .withColumn("_last", F.last("_v", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            F.col("_k").alias(key),
            F.col("_ts").alias(probe_ts),
            F.col("_last._cap_ts").alias(cap_ts),
            *[F.col(f"_last.{c_}").alias(c_) for c_ in payload],
        )
    )


# --- deterministic multi-capture store over the documents table -------
#
# Three captures per document URL, one hour apart, digests keyed on the
# capture ordinal — closed form, so the DuckDB oracle re-derives the
# same store from the same table (oracle/sqlgen.sql_snapshot_asof /
# sql_cdx_closest).

CAPTURE_EPOCH = "2026-01-01"
CAPTURES_PER_URL = 3
CAPTURE_GAP_S = 3600


def synth_captures(
    docs: DataFrame, digest_k=None, with_bytes: bool = False
) -> DataFrame:
    """(url, host, ts, digest[, n_bytes]): CAPTURES_PER_URL captures per
    doc url at epoch + doc_id seconds + k hours, digest = md5(text ||
    ordinal). ``digest_k`` overrides the digest ordinal (a Column over
    ``k``/``doc_id``) — revisit.synth_revisit_captures plants unchanged
    recrawls by mapping some ordinals back to 0; the default (the
    capture ordinal itself) makes every capture distinct."""
    k = F.explode(F.sequence(F.lit(0), F.lit(CAPTURES_PER_URL - 1))).alias("k")
    base = docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat("source", F.lit(".example.com")).alias("host"),
        "doc_id",
        "text",
        k,
    )
    ts = F.to_timestamp(F.lit(CAPTURE_EPOCH)) + F.make_interval(
        secs=F.col("doc_id") + F.col("k") * CAPTURE_GAP_S
    )
    dk = F.col("k") if digest_k is None else digest_k
    cols = [
        "url",
        "host",
        ts.alias("ts"),
        F.md5(F.concat("text", dk.cast("string"))).alias("digest"),
    ]
    if with_bytes:
        cols.append(F.length("text").cast("long").alias("n_bytes"))
    return base.select(*cols)


def synth_probes(docs: DataFrame) -> DataFrame:
    """(url, t): one probe per doc url, offset by doc_id % 4 — before
    the first capture (NULL join result), then between each pair."""
    off = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(-1))
        .when(F.col("doc_id") % 4 == 1, F.lit(1800))
        .when(F.col("doc_id") % 4 == 2, F.lit(5400))
        .otherwise(F.lit(9000))
    )
    return docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit(CAPTURE_EPOCH))
            + F.make_interval(secs=F.col("doc_id") + off)
        ).alias("t"),
    )
