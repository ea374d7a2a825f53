"""robots.txt parser (functions/robots_parse.py).

Reference oracle: an independent imperative Python implementation of
the same documented RFC 9309 subset, plus hand-checked fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.robots_parse import parse_robots, robots_from_bodies
from crawler_spark.operators.robots import gate_tag


def _py_parse(txt: str | None):
    prefixes: list[str] = []
    delay = None
    in_header, applies = False, False
    for raw in (txt or "").split("\n"):
        ln = raw.split("#", 1)[0].strip()
        if not ln:
            continue
        k = ln.split(":", 1)[0].strip().lower()
        v = ln.split(":", 1)[1].strip() if ":" in ln else ln
        if k == "user-agent":
            applies = (applies or v == "*") if in_header else (v == "*")
            in_header = True
        else:
            in_header = False
            if applies and k == "disallow" and v:
                prefixes.append(v)
            if applies and k == "crawl-delay":
                try:
                    delay = float(v)
                except ValueError:
                    pass
    return prefixes, delay


FIXTURES = [
    # plain single group
    (1, "User-agent: *\nDisallow: /admin\nDisallow: /tmp\nCrawl-delay: 2"),
    # our group listed second; first group must not leak
    (2, "User-agent: googlebot\nDisallow: /g-only\n\nUser-agent: *\nDisallow: /x"),
    # shared header: two UA lines, one is *
    (3, "User-agent: googlebot\nUser-agent: *\nDisallow: /shared"),
    # rules BEFORE any user-agent line are ignored; empty Disallow adds nothing
    (4, "Disallow: /orphan\nUser-agent: *\nDisallow:\nDisallow: /real"),
    # case-insensitive keys, \r\n endings, comments, colon in value
    (5, "USER-AGENT: *\r\nDISALLOW: /a:b  # inline comment\r\nCrawl-Delay: 1.5\r\n"),
    # a UA line after rules opens a NEW group (does not extend the old header)
    (6, "User-agent: *\nDisallow: /one\nUser-agent: googlebot\nDisallow: /goog"),
    # non-numeric crawl-delay ignored; last applicable delay wins
    (7, "User-agent: *\nCrawl-delay: soon\nCrawl-delay: 3\nCrawl-delay: 4"),
    # no * group at all
    (8, "User-agent: googlebot\nDisallow: /"),
    # null body
    (9, None),
]


def test_parse_matches_python_oracle(spark):
    df = spark.createDataFrame(FIXTURES, "host long, robots_txt string")
    out = {
        r["host"]: (r["p"], r["d"])
        for r in df.select(
            "host",
            parse_robots(F.col("robots_txt"))["disallow_prefixes"].alias("p"),
            parse_robots(F.col("robots_txt"))["crawl_delay"].alias("d"),
        ).collect()
    }
    for host, txt in FIXTURES:
        exp_p, exp_d = _py_parse(txt)
        assert out[host] == (exp_p, exp_d), (host, out[host], (exp_p, exp_d))
    # hand-checked spots (so the python oracle itself is pinned)
    assert out[1] == (["/admin", "/tmp"], 2.0)
    assert out[2] == (["/x"], None)
    assert out[3] == (["/shared"], None)
    assert out[4] == (["/real"], None)
    assert out[5] == (["/a:b"], 1.5)
    assert out[6] == (["/one"], None)
    assert out[7] == ([], 4.0)
    assert out[8] == ([], None)
    assert out[9] == ([], None)


def test_rules_table_feeds_gate(spark):
    bodies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private"), ("b.com", None)],
        "host string, robots_txt string",
    )
    rules = robots_from_bodies(bodies)
    cand = spark.createDataFrame(
        [
            ("a.com", "/private/page"),
            ("a.com", "/public"),
            ("b.com", "/private/page"),
            ("c.com", "/anything"),
        ],
        "host string, path string",
    )
    tagged = gate_tag(cand, rules)
    got = {(r["host"], r["path"]): r["_blocked"] for r in tagged.collect()}
    assert got[("a.com", "/private/page")] is True
    assert got[("a.com", "/public")] is False
    assert got[("b.com", "/private/page")] is False
    assert got[("c.com", "/anything")] is False


def test_parse_is_single_projection_no_python(spark):
    df = spark.createDataFrame([(1, "User-agent: *\nDisallow: /x")],
                               "host long, robots_txt string")
    plan = (
        df.select(parse_robots(F.col("robots_txt")).alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # pure JVM expression tree
    assert "Exchange" not in plan


@pytest.mark.spark
def test_robots_sitemaps_extraction(spark):
    """Sitemap: records are standalone (any case, any group position,
    comments stripped); hosts without one yield an empty array."""
    from crawler_spark.functions.robots_parse import robots_sitemaps

    body = (
        "User-agent: googlebot\nDisallow: /private\n"
        "SITEMAP: https://h.example/sitemap.xml  # comment\n"
        "User-agent: *\nDisallow: /tmp\n"
        "sitemap: https://h.example/s2.xml.gz\n"
    )
    df = spark.createDataFrame([(body,), (None,)], "txt string")
    got = [r["sm"] for r in df.select(robots_sitemaps(F.col("txt")).alias("sm")).collect()]
    assert got[0] == ["https://h.example/sitemap.xml", "https://h.example/s2.xml.gz"]
    assert got[1] == []
