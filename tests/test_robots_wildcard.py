"""RFC 9309 wildcard robots matching (functions/robots_parse.py
parse_robots_rules/rfc9309_match + operators/robots.gate_rfc9309).

Table-driven cases from the public REP documentation (RFC 9309 §2.2.2
plus Google Search Central's robots.txt examples): ``*`` runs, ``$``
end anchors, Allow/Disallow longest-match precedence, allow on ties.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.robots_parse import (
    parse_robots_rules,
    rfc9309_match,
    robots_rules_from_bodies,
)
from crawler_spark.operators.robots import gate_rfc9309


def _verdicts(spark, body, paths):
    df = spark.createDataFrame([(body, p) for p in paths], "body string, path string")
    v = rfc9309_match(F.col("path"), parse_robots_rules(F.col("body")))
    return {
        r["path"]: (r["a"], r["rule"])
        for r in df.select("path", v["allowed"].alias("a"), v["rule"].alias("rule")).collect()
    }


# Google's documented pattern-match examples
PATTERN_CASES = [
    # (disallow pattern, path, blocked?)
    ("/fish", "/fish", True),
    ("/fish", "/fishheads", True),          # prefix match
    ("/fish", "/fish/salmon.html", True),
    ("/fish", "/Fish.asp", False),          # case-sensitive
    ("/fish*", "/fishheads/yummy.html", True),  # trailing * redundant
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish", False),             # directory rule
    ("/*.php", "/filename.php", True),
    ("/*.php", "/folder/filename.php?p=1", True),
    ("/*.php", "/", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),  # $ anchors
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
]


@pytest.mark.parametrize("pat,path,blocked", PATTERN_CASES)
def test_pattern_matching(spark, pat, path, blocked):
    got = _verdicts(spark, f"User-agent: *\nDisallow: {pat}\n", [path])
    assert got[path][0] == (not blocked)


def test_precedence_longest_match_wins(spark):
    body = "User-agent: *\nAllow: /p\nDisallow: /\n"
    got = _verdicts(spark, body, ["/page", "/", "/x"])
    assert got["/page"] == (True, "/p")    # /p (2) beats / (1)
    assert got["/x"] == (False, "/")
    assert got["/"] == (False, "/")


def test_precedence_tie_goes_to_allow(spark):
    body = "User-agent: *\nAllow: /folder\nDisallow: /folder\n"
    got = _verdicts(spark, body, ["/folder/page"])
    assert got["/folder/page"] == (True, "/folder")


def test_precedence_wildcard_length_counts(spark):
    # /page (5) vs /*.htm (6): the longer wildcard rule wins
    body = "User-agent: *\nAllow: /page\nDisallow: /*.htm\n"
    got = _verdicts(spark, body, ["/page.htm", "/page"])
    assert got["/page.htm"] == (False, "/*.htm")
    assert got["/page"] == (True, "/page")


def test_no_match_allows_with_null_rule(spark):
    got = _verdicts(spark, "User-agent: *\nDisallow: /private\n", ["/public"])
    assert got["/public"] == (True, None)


def test_group_selection_and_empty_rules(spark):
    body = (
        "User-agent: googlebot\nDisallow: /\n\n"
        "User-agent: *\nDisallow:\nAllow:\nDisallow: /tmp/\n"
    )
    got = _verdicts(spark, body, ["/anything", "/tmp/x"])
    assert got["/anything"] == (True, None)   # googlebot's '/' not ours; empty rules ignored
    assert got["/tmp/x"] == (False, "/tmp/")


def test_like_metachars_are_literal(spark):
    # % and _ are literal in robots patterns, not LIKE wildcards
    body = "User-agent: *\nDisallow: /a%b\nDisallow: /c_d\n"
    got = _verdicts(spark, body, ["/a%b", "/aXb", "/c_d", "/cXd"])
    assert got["/a%b"][0] is False
    assert got["/aXb"][0] is True
    assert got["/c_d"][0] is False
    assert got["/cXd"][0] is True


def test_gate_rfc9309_join(spark):
    rules = robots_rules_from_bodies(
        spark.createDataFrame(
            [("h1", "User-agent: *\nDisallow: /priv*\nAllow: /priv/ok$\n")],
            "host string, robots_txt string",
        )
    )
    cands = spark.createDataFrame(
        [("h1", "/priv/x"), ("h1", "/priv/ok"), ("h2", "/priv/x")],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): (r["allowed"], r["rule"])
        for r in gate_rfc9309(cands, rules).collect()
    }
    assert got[("h1", "/priv/x")] == (False, "/priv*")
    assert got[("h1", "/priv/ok")] == (True, "/priv/ok$")
    assert got[("h2", "/priv/x")] == (True, None)  # unknown host


def test_gate_rfc9309_none_rules(spark):
    cands = spark.createDataFrame([("h1", "/x")], "host string, path string")
    row = gate_rfc9309(cands, None).collect()[0]
    assert row["allowed"] is True and row["rule"] is None
