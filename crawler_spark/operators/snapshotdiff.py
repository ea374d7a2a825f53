"""Crawl snapshot diff: change detection between two crawl rounds.

Incremental crawlers re-crawl by measured change rate (Cho &
Garcia-Molina, "The Evolution of the Web and Implications for an
Incremental Crawler", VLDB 2000 — public): diff the (url → content
hash) sets of two snapshots, classify every URL added / gone /
changed / unchanged, and roll the rates up per host to drive the
revisit schedule. The reference crawler has no incremental tier (its
seen-set is monotonic — SURVEY §2.4); this adds it.

Scale shape: ONE full-outer equi-join on url — shuffle-on-key both
sides. On a 10^10-URL store keep snapshots as Iceberg tables bucketed
by url-hash so the diff is a storage-partitioned join (no shuffle at
all); the per-host rollup after it is a partial-agg group-by. Content
equality uses the stored md5, never the bodies — the diff moves
(url, hash) pairs, not pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHANGE_SCALE = 1_000_000  # change rate in parts-per-million


def snapshot_diff(prev: DataFrame, curr: DataFrame) -> DataFrame:
    """(url, host, status) for every URL in either snapshot; inputs are
    (url, host, content_md5). status ∈ added|gone|changed|unchanged."""
    a = prev.select("url", "host", F.col("content_md5").alias("_h_prev"))
    b = curr.select(
        F.col("url").alias("_u_b"),
        F.col("host").alias("_host_b"),
        F.col("content_md5").alias("_h_curr"),
    )
    j = a.join(b, a.url == b._u_b, "full_outer")
    # presence is decided by the JOIN KEYS, not hash nullness — a stored
    # NULL hash (failed fetch) must not reclassify the row; changed vs
    # unchanged uses null-safe equality so NULL hashes compare as values
    return j.select(
        F.coalesce("url", "_u_b").alias("url"),
        F.coalesce("host", "_host_b").alias("host"),
        F.when(F.col("url").isNull(), "added")
        .when(F.col("_u_b").isNull(), "gone")
        .when(F.expr("_h_prev <=> _h_curr"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


def recrawl_report(diff: DataFrame) -> DataFrame:
    """Per-host revisit signal: status counts + change_ppm over the URLs
    seen in both snapshots (the Cho/Garcia-Molina estimator's numerator
    and denominator, integer-exact)."""
    agg = diff.groupBy("host").agg(
        F.sum((F.col("status") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("status") == "gone").cast("long")).alias("n_gone"),
        F.sum((F.col("status") == "changed").cast("long")).alias("n_changed"),
        F.sum((F.col("status") == "unchanged").cast("long")).alias("n_unchanged"),
    )
    both = F.col("n_changed") + F.col("n_unchanged")
    return agg.select(
        "host",
        "n_added",
        "n_gone",
        "n_changed",
        "n_unchanged",
        F.when(both > 0, F.expr(f"(n_changed * {CHANGE_SCALE}) div (n_changed + n_unchanged)"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("change_ppm"),
    )


RECRAWL_BUDGET = 25  # URLs dispatched per host per round

# status → urgency weight: a changed URL is recrawled first, a newly
# discovered one next, a stable one last; gone URLs leave the schedule
_STATUS_WEIGHT = {"changed": 3, "added": 2, "unchanged": 1}


def recrawl_schedule(diff: DataFrame, budget: int = RECRAWL_BUDGET) -> DataFrame:
    """The next round's work list: per-host top-``budget`` URLs ranked by
    an integer priority combining the URL's own status urgency with its
    host's measured change rate (Cho/Garcia-Molina revisit policy: hot
    hosts drain their budget on changed URLs; cold hosts still refresh).

    priority = status_weight * CHANGE_SCALE + host change_ppm — both
    integer-exact, so the oracle reproduces it closed-form.

    Scale shape: the per-host rate table is hosts-sized (≪ URLs) →
    broadcast equi-join, no shuffle of the URL side for the join; the
    top-``budget`` cut is one window partitioned by host — bounded
    output (budget rows per host), same shape as the politeness budget
    operator, and at 10^10 URLs the same skew treatment applies (the
    window sorts only within each host's partition slice).
    """
    # diff is a full-outer join over two snapshot scans and feeds BOTH
    # branches (rates aggregate + scored rows); checkpoint it once so
    # the most expensive stage doesn't execute twice (same pattern as
    # the pagerank node list)
    diff = diff.localCheckpoint()
    rates = recrawl_report(diff).select("host", "change_ppm")
    w = F.create_map(
        *[x for kv in _STATUS_WEIGHT.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )[F.col("status")].cast("long")
    scored = (
        diff.where(F.col("status") != "gone")
        .join(F.broadcast(rates), "host")
        .select(
            "host",
            "url",
            (w * CHANGE_SCALE + F.col("change_ppm")).alias("priority"),
        )
    )
    win = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("long"))
        .where(F.col("rk") <= budget)
    )


def synth_snapshots(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic crawl rounds over the documents table:
    round A drops doc_id % 10 == 3, round B drops % 10 == 7 and
    rewrites bodies where doc_id % 5 == 0 — so the diff has all four
    statuses in closed form for the oracle."""
    base = docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat("source", F.lit(".example.com")).alias("host"),
        "doc_id",
        "text",
    )
    prev = base.where(F.col("doc_id") % 10 != 3).select(
        "url", "host", F.md5("text").alias("content_md5")
    )
    curr = base.where(F.col("doc_id") % 10 != 7).select(
        "url",
        "host",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("content_md5"),
    )
    return prev, curr
