"""EP1 — CDX-targeted search (SURVEY §3 EP1).

Reference lifecycle (/root/reference/src/crawler.py:60-133 driven by
main.py): CDX index query with server-side matchType/status/time/limit →
per-record WARC range fetch → parse → detect → confidence gate → GLOBAL
URL dedupe → R7 result rows. Also the per-domain outer loop
(src/crawler.py:205-242; main.py:128-134): sequential `search_and_detect`
per domain with limit_per_domain — recast here as ONE distributed query
(seeds ⋈ cdx + per-host window), SURVEY §2.8.

Spark-first mapping:
- the CDX index is a *projection of the pages table* (R1 ≈ R3+R4 metadata,
  SURVEY §1.1); matchType becomes a SURT-key predicate family that pushes
  down to the scan:
    exact  → surt = key
    prefix → startswith(surt, key)
    host   → host = h
    domain → host = d OR host LIKE '%.d'
- server-side status/time filters → WHERE on (status, warc_ts) — Iceberg
  partition/stat pruning territory;
- limit → df.limit (Catalyst CollectLimit);
- fetch = join back to pages on url (broadcast when the CDX selection is
  small — the common targeted case);
- dedupe policy: GLOBAL url first-wins (src/crawler.py:181-186), unlike
  EP2's per-WARC policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.url import canonicalize_udf


def cdx_from_pages(pages: DataFrame) -> DataFrame:
    """R1 projection: the CDX index a crawl would publish for these pages
    (urlkey=SURT, 14-digit ts, mime/status/length, WARC location)."""
    c = canonicalize_udf(F.col("url"))
    return pages.select(
        F.col("url"),
        c.alias("_c"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts"),
        F.col("mime"),
        F.col("status"),
        F.md5(F.col("text")).alias("digest"),
        F.length(F.col("html")).cast("bigint").alias("length"),
        F.col("warc_offset").alias("offset"),
        F.col("warc_source").alias("filename"),
    ).select(
        F.col("_c.surt").alias("urlkey"),
        "ts", "url", "mime", "status", "digest", "length", "offset", "filename",
        F.col("_c.host").alias("host"),
    )


def match_predicate(match_type: str, key: str) -> Column:
    """The CDX matchType family as pushdown-able predicates
    (reference src/cdx/client.py:88-101)."""
    if match_type == "exact":
        return F.col("urlkey") == key
    if match_type == "prefix":
        return F.col("urlkey").startswith(key)
    if match_type == "host":
        return F.col("host") == key
    if match_type == "domain":
        return (F.col("host") == key) | F.col("host").endswith("." + key)
    raise ValueError(f"unknown match_type {match_type!r}")


def cdx_search(
    cdx: DataFrame,
    key: str,
    match_type: str = "prefix",
    filter_status: int | None = 200,
    from_ts: str | None = None,
    to_ts: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """CDXClient.search (reference src/cdx/client.py:54-146): the server-
    side params as WHERE clauses; malformed rows (null urlkey) skipped like
    the client skips unparseable lines (:131-133)."""
    df = cdx.where(F.col("urlkey").isNotNull()).where(match_predicate(match_type, key))
    if filter_status is not None:
        df = df.where(F.col("status") == filter_status)
    if from_ts:
        df = df.where(F.col("ts") >= from_ts)
    if to_ts:
        df = df.where(F.col("ts") <= to_ts)
    if limit:
        df = df.orderBy("urlkey", "ts").limit(limit)  # deterministic page
    return df


def targeted_search(
    pages: DataFrame,
    key: str,
    match_type: str = "prefix",
    filter_status: int | None = 200,
    from_ts: str | None = None,
    to_ts: str | None = None,
    limit: int | None = None,
    min_confidence: str = "medium",
) -> DataFrame:
    """EP1 end-to-end: CDX select → fetch-join pages → classify → global
    dedupe → R7 rows.

    R7 parity decision: the reference stamps each result with wall-clock
    ``datetime.now().isoformat()`` as ``detected_at`` (src/crawler.py:192)
    and the CDX record's 14-digit timestamp as ``crawl_date``. Wall-clock
    is not data in a deterministic engine, so ``detected_at`` here is a
    deterministic stand-in — the record's crawl event time (warc_ts) in
    the same ISO format — and ``crawl_date`` is warc_ts rendered as the
    CDX timestamp. R7's column set is therefore complete
    (sinks.CSV_COLS_CDX exports every column)."""
    from crawler_spark.plans.flagship import classify_bulk

    sel = cdx_search(
        cdx_from_pages(pages), key, match_type, filter_status, from_ts, to_ts, limit
    ).select("url")
    hits = pages.join(F.broadcast(sel), "url", "left_semi")
    res = classify_bulk(
        hits, min_confidence=min_confidence, dedupe="global", extra_cols=("warc_ts",)
    )
    return res.select(
        "*",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("detected_at"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("crawl_date"),
    ).drop("warc_ts")


def crawl_catalog(pages: DataFrame, crawl_col: Column | None = None) -> DataFrame:
    """Index-of-indexes (reference src/cdx/client.py:32-41): the catalog of
    available crawl indexes with per-crawl stats. In Common Crawl this is
    collinfo.json; here it derives from the corpus itself — one row per
    crawl id with its record count and time span (an Iceberg
    snapshot-catalog scan at production)."""
    cid = crawl_col if crawl_col is not None else F.regexp_extract(
        F.col("warc_source"), r"(CC-[A-Z]+-[0-9-]+)", 1
    )
    return (
        pages.groupBy(cid.alias("crawl_id"))
        .agg(
            F.count("*").alias("n_records"),
            F.min("warc_ts").alias("from_ts"),
            F.max("warc_ts").alias("to_ts"),
        )
    )


def latest_index(catalog: DataFrame) -> DataFrame:
    """get_latest_index (reference src/cdx/client.py:43-52): newest crawl
    first, id with the 'CC-MAIN-' prefix stripped. One row."""
    return (
        catalog.orderBy(F.desc("crawl_id"))
        .limit(1)
        .select(
            F.regexp_replace("crawl_id", r"^CC-MAIN-", "").alias("latest"),
            "n_records",
        )
    )


def per_domain_search(
    pages: DataFrame,
    domains: DataFrame,
    limit_per_domain: int = 10,
    filter_status: int | None = 200,
) -> DataFrame:
    """The reference's per-domain OUTER LOOP (one CDX API call per domain,
    src/crawler.py:205-242) as one distributed query: seeds ⋈ cdx on host
    + per-host head-k window — O(domains) sequential API round-trips
    become a single broadcast join (SURVEY §2.8 'one shot').

    domains: DataFrame with a ``domain`` column.
    Returns cdx rows, ≤ limit_per_domain per domain, in (urlkey, ts) order
    — the deterministic page the reference's stream order implies.

    Join strategy: the domain predicate ``host = d OR host LIKE '%.d'``
    is a non-equi OR — as a join condition it plans as a
    BroadcastNestedLoopJoin, O(cdx × domains) comparisons (quadratic at a
    10^6-domain seed file). Instead each host explodes into its
    dot-boundary suffix chain (``a.b.c`` → a.b.c, b.c, c — ≤ ~5 rows) and
    joins on ``suffix = domain`` — an equi-key, so Catalyst plans a
    BroadcastHashJoin: linear in cdx rows, O(1) probe per suffix. The
    exploded suffix set matches the OR predicate exactly (suffixes align
    at label boundaries), including a host matching several listed
    domains appearing once per match.
    """
    cdx = cdx_from_pages(pages)
    if filter_status is not None:
        cdx = cdx.where(F.col("status") == filter_status)
    d = F.broadcast(domains.select(F.col("domain").alias("_dom")).distinct())
    labels = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    joined = cdx.withColumn("_suffix", F.explode(suffixes)).join(
        d, F.col("_suffix") == F.col("_dom")
    )
    w = Window.partitionBy("_dom").orderBy("urlkey", "ts")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit_per_domain)
        .select(F.col("_dom").alias("domain"), "urlkey", "ts", "url", "status", "filename")
    )
