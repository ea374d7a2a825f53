"""Crawl-operations reporting: grouping-sets rollup and exact-quantile
latency SLOs.

The reference prints flat per-run counters (pages fetched, failures by
reason — src/crawler.py stats dict, SURVEY §2.5); a fleet-level crawl
dashboard needs the same numbers at every granularity at once
(host × status, per host, grand total) and distribution tails, not
means (a politeness stall shows up at p99 long before it moves the
average).

Scale shape:
- ``crawl_rollup`` is ONE pass: Spark plans ROLLUP as an Expand node
  (each input row replicated once per grouping set) feeding a single
  partial-aggregate group-by — map-side combine on every set, one
  shuffle. No self-union of three separate aggregates, no rescan.
- ``latency_quantiles`` uses the exact ``percentile`` aggregate —
  partial state is a per-partition value buffer, merged once. Exact
  quantiles hold to ~10^8 rows per group; past that switch the same
  query to ``percentile_approx`` (t-digest, bounded state) — the
  report schema is identical, which is why the column names carry no
  algorithm suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANTILES = (0.5, 0.9, 0.99)


def crawl_rollup(pages: DataFrame) -> DataFrame:
    """(host, status, level, n_pages, total_bytes) for every ROLLUP
    grouping set of (host, status); subtotal rows are labelled 'ALL'
    and ``level`` = grouping(host)*2 + grouping(status) disambiguates
    a genuine NULL group value from a subtotal row.

    Input: (host, status int, n_bytes long).
    """
    return (
        pages.rollup("host", "status")
        .agg(
            (F.grouping("host") * 2 + F.grouping("status"))
            .cast("long")
            .alias("level"),
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .select(
            F.coalesce(F.col("host"), F.lit("ALL")).alias("host"),
            F.coalesce(F.col("status").cast("string"), F.lit("ALL")).alias(
                "status"
            ),
            "level",
            "n_pages",
            "total_bytes",
        )
    )


def latency_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, n, p50, p90, p99) — exact linear-interpolation
    quantiles of ``value`` per event type (same interpolation rule as
    DuckDB quantile_cont, bit-identical)."""
    qs = ", ".join(f"{q}D" for q in QUANTILES)
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"percentile(value, array({qs}))").alias("_q"),
    )
    return agg.select(
        "event_type",
        "n",
        *[F.col("_q")[i].alias(f"p{int(q * 100)}") for i, q in enumerate(QUANTILES)],
    )


def synth_page_stats(docs: DataFrame) -> DataFrame:
    """(host, status, n_bytes) from documents — deterministic status mix
    (doc_id % 20: 0→404, 1→500, 2→301, else 200), bytes = n_chars."""
    m = F.col("doc_id") % 20
    return docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.when(m == 0, 404)
        .when(m == 1, 500)
        .when(m == 2, 301)
        .otherwise(200)
        .alias("status"),
        F.col("n_chars").alias("n_bytes"),
    )


# ---------------------------------------------------- politeness audit --

COMPLIANCE_PPM = 1_000_000


def politeness_compliance(
    fetches: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
) -> DataFrame:
    """Read-side politeness audit: the budget operator PREVENTS
    violations, this PROVES conformance from the fetch log — the number
    an ops review or a webmaster complaint asks for.

    ``fetches(host, event_id, ts)`` ⋈ ``delays(host, crawl_delay_s)``
    (broadcast dim) → per host: fetches, measured intervals, intervals
    shorter than the advertised crawl-delay, the tightest gap observed,
    and an exact ppm compliance rate. One lag window per host (ordered
    by (ts, event_id) so duplicate timestamps stay deterministic —
    skew bound = hottest host's fetch count, same as sessionize);
    integer epoch-microsecond arithmetic throughout."""
    from pyspark.sql import Window

    f = fetches.select(
        F.col(host_col).alias("host"),
        "event_id",
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    w = Window.partitionBy("host").orderBy("_us", "event_id")
    g = f.withColumn("_gap_us", F.col("_us") - F.lag("_us").over(w))
    # LEFT join: a host with no advertised delay must stay IN the audit
    # (vacuously compliant — nothing to violate), not silently vanish
    j = g.join(F.broadcast(delays.select("host", "crawl_delay_s")), "host", "left")
    viol = F.coalesce(
        (F.col("_gap_us") < F.col("crawl_delay_s") * 1_000_000).cast("long"),
        F.lit(0),
    )
    return (
        j.groupBy("host", "crawl_delay_s")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.count("_gap_us").alias("n_intervals"),
            F.sum(F.when(F.col("_gap_us").isNotNull(), viol).otherwise(0)).alias(
                "n_violations"
            ),
            F.min("_gap_us").alias("min_gap_us"),
        )
        .withColumn(
            "compliance_ppm",
            F.expr(
                f"CASE WHEN n_intervals > 0 THEN "
                f"((n_intervals - n_violations) * {COMPLIANCE_PPM}) div n_intervals "
                f"ELSE CAST({COMPLIANCE_PPM} AS BIGINT) END"
            ),
        )
    )


def synth_crawl_delays(fetches: DataFrame, host_col: str = "host") -> DataFrame:
    """Closed-form per-host advertised delay: the trailing digits of the
    host name pick 1..5 seconds — same derivation both engines run."""
    # rlike guard keeps the cast lazy: a digit-less host gets the 1 s
    # floor instead of an ANSI cast crash (same hazard class as the
    # sitemap priority parse)
    g = F.regexp_extract("host", r"(\d+)$", 1).cast("long")
    delay = F.when(F.col("host").rlike(r"\d$"), g % 5 + 1).otherwise(F.lit(1))
    return (
        fetches.select(F.col(host_col).alias("host"))
        .distinct()
        .select("host", delay.cast("long").alias("crawl_delay_s"))
    )
