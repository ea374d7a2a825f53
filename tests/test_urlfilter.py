"""operators/urlfilter.py — blocklist filter + host reputation."""

from crawler_spark.operators.urlfilter import (
    host_reputation,
    url_category_filter,
)


def test_filter_precedence_and_reasons(spark):
    pages = spark.createDataFrame(
        [
            ("https://bad.example.com/d/13", "bad.example.com"),  # both rules
            ("https://ok.example.com/d/13", "ok.example.com"),  # path only
            ("https://ok.example.com/d/113", "ok.example.com"),  # regex \d*13$
            ("https://ok.example.com/d/130", "ok.example.com"),  # 13 not at end
            ("https://ok.example.com/d/1", "ok.example.com"),
        ],
        "url string, host string",
    )
    bl = spark.createDataFrame([("bad.example.com",)], "host string")
    got = {r["url"]: (r["keep"], r["reason"]) for r in url_category_filter(pages, bl).collect()}
    assert got["https://bad.example.com/d/13"] == (False, "domain_blocklist")
    assert got["https://ok.example.com/d/13"] == (False, "path_pattern")
    assert got["https://ok.example.com/d/113"] == (False, "path_pattern")
    assert got["https://ok.example.com/d/130"] == (True, "ok")
    assert got["https://ok.example.com/d/1"] == (True, "ok")


def test_filter_blocklist_is_broadcast(spark):
    pages = spark.createDataFrame(
        [("https://a/x", "a")], "url string, host string"
    )
    bl = spark.createDataFrame([("b",)], "host string")
    plan = (
        url_category_filter(pages, bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # regex stays JVM-side


def test_reputation_verdicts(spark):
    rows = (
        # shorty: 2/4 short -> block
        [("shorty", "en", 50), ("shorty", "en", 60), ("shorty", "en", 500), ("shorty", "en", 500)]
        # foreign: 3/4 non-en -> review
        + [("foreign", "de", 500), ("foreign", "fr", 500), ("foreign", "zh", 500), ("foreign", "en", 500)]
        # fine: all good
        + [("fine", "en", 500), ("fine", "en", 400)]
    )
    docs = spark.createDataFrame(rows, "host string, lang string, n_chars long")
    got = {r["host"]: r for r in host_reputation(docs).collect()}
    assert got["shorty"]["verdict"] == "block"
    assert got["shorty"]["short_ppm"] == 500_000
    assert got["foreign"]["verdict"] == "review"
    assert got["foreign"]["nonen_ppm"] == 750_000
    assert got["fine"]["verdict"] == "allow"
    assert got["fine"]["avg_chars"] == 450
