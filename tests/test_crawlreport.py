"""operators/crawlreport.py + snapshotdiff.recrawl_schedule."""

from pyspark.sql import functions as F

from crawler_spark.operators.crawlreport import (
    crawl_rollup,
    latency_quantiles,
    synth_page_stats,
)
from crawler_spark.operators.snapshotdiff import (
    CHANGE_SCALE,
    recrawl_schedule,
)


def test_rollup_levels_and_totals(spark):
    pages = spark.createDataFrame(
        [("h1", 200, 10), ("h1", 200, 20), ("h1", 404, 5), ("h2", 200, 7)],
        "host string, status int, n_bytes long",
    )
    rows = {(r["host"], r["status"]): r for r in crawl_rollup(pages).collect()}
    assert rows[("h1", "200")]["n_pages"] == 2
    assert rows[("h1", "ALL")]["total_bytes"] == 35
    assert rows[("h1", "ALL")]["level"] == 1
    assert rows[("ALL", "ALL")]["n_pages"] == 4
    assert rows[("ALL", "ALL")]["level"] == 3
    # detail rows are level 0
    assert rows[("h2", "200")]["level"] == 0


def test_rollup_single_pass_plan(spark):
    docs = spark.range(100).selectExpr(
        "id AS doc_id", "concat('s', id % 3) AS source", "id AS n_chars"
    )
    df = crawl_rollup(synth_page_stats(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # ROLLUP = one Expand, not a union of aggs
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" not in plan


def test_latency_quantiles_exact(spark):
    # 0..100 scaled: p50=85.0, p90=153.0 (known closed form)
    ev = spark.range(101).selectExpr(
        "'fetch' AS event_type", "cast(id AS double) * 1.7 AS value"
    )
    r = latency_quantiles(ev).collect()[0]
    assert (r["n"], r["p50"], r["p90"]) == (101, 85.0, 153.0)


def test_recrawl_schedule_priority_and_budget(spark):
    diff = spark.createDataFrame(
        [
            ("u1", "hot", "changed"),
            ("u2", "hot", "unchanged"),
            ("u3", "hot", "added"),
            ("u4", "hot", "gone"),
            ("u5", "cold", "unchanged"),
        ],
        "url string, host string, status string",
    )
    rows = recrawl_schedule(diff, budget=2).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    # gone is never scheduled; budget caps hot at 2 of its 3 live URLs
    assert len(by_host["hot"]) == 2
    hot = sorted(by_host["hot"], key=lambda r: r["rk"])
    # changed outranks added outranks unchanged
    assert [r["url"] for r in hot] == ["u1", "u3"]
    # hot host: 1 changed / 2 seen-in-both -> 500000 ppm folded in
    assert hot[0]["priority"] == 3 * CHANGE_SCALE + CHANGE_SCALE // 2
    # cold host still gets its refresh slot
    assert [r["url"] for r in by_host["cold"]] == ["u5"]
    assert by_host["cold"][0]["priority"] == 1 * CHANGE_SCALE + 0


def test_recrawl_schedule_rates_join_is_broadcast(spark):
    diff = spark.createDataFrame(
        [("u1", "h", "changed")], "url string, host string, status string"
    )
    plan = (
        recrawl_schedule(diff)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
