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


AGENT_BODY = (
    "User-agent: googlebot\nDisallow: /goog\n\n"
    "User-agent: *\nDisallow: /all\n\n"
    "User-agent: GoogleBot\nDisallow: /goog2\n"
)


def _rules(spark, body, agent):
    df = spark.createDataFrame([(body,)], "body string")
    out = df.select(
        parse_robots_rules(F.col("body"), agent=agent).alias("r")
    ).collect()[0]["r"]
    return [(r["pattern"], r["allow"]) for r in out]


def test_agent_group_selection(spark):
    # exact-agent groups (case-insensitive, merged across the file) win
    assert _rules(spark, AGENT_BODY, "googlebot") == [
        ("/goog", False),
        ("/goog2", False),
    ]
    # unknown agent falls back to the * group
    assert _rules(spark, AGENT_BODY, "bingbot") == [("/all", False)]
    # agent=None selects * directly
    assert _rules(spark, AGENT_BODY, None) == [("/all", False)]


def test_addressed_empty_group_means_allow_all(spark):
    # a group that names the agent but has no rules must NOT fall back
    # to the * group's restrictions (RFC 9309 §2.2.1); the empty group
    # comes AFTER a rule-terminated group — per the RFC grammar, UA
    # lines separated only by blank lines would MERGE into one group
    body = "User-agent: *\nDisallow: /\n\nUser-agent: mybot\n"
    assert _rules(spark, body, "mybot") == []
    assert _rules(spark, body, "other") == [("/", False)]


def test_blank_separated_ua_lines_merge(spark):
    # RFC 9309 grammar: startgrouplines with only emptylines between
    # them form ONE group — mybot shares the * group's rule here
    body = "User-agent: mybot\n\nUser-agent: *\nDisallow: /\n"
    assert _rules(spark, body, "mybot") == [("/", False)]


def test_agent_group_owns_crawl_delay(spark):
    # the selected group's crawl-delay applies — never the inapplicable
    # * group's (a 100x politeness error otherwise)
    from crawler_spark.functions.robots_parse import robots_rfc9309_from_bodies

    body = (
        "User-agent: mybot\nCrawl-delay: 10\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 0.1\nDisallow: /b\n"
    )
    df = spark.createDataFrame([("h", body)], "host string, robots_txt string")

    def delay(agent):
        return robots_rfc9309_from_bodies(df, agent=agent).collect()[0]["crawl_delay"]

    assert delay("mybot") == 10.0
    assert delay("otherbot") == 0.1
    assert delay(None) == 0.1
    # exact group WITHOUT a delay: no fallback to the * group's value
    body2 = "User-agent: mybot\nDisallow: /a\n\nUser-agent: *\nCrawl-delay: 5\n"
    df2 = spark.createDataFrame([("h", body2)], "host string, robots_txt string")
    assert (
        robots_rfc9309_from_bodies(df2, agent="mybot").collect()[0]["crawl_delay"]
        is None
    )


def test_shared_group_header(spark):
    # one rule block under two UA lines applies to both
    body = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    assert _rules(spark, body, "a") == [("/x", False)]
    assert _rules(spark, body, None) == [("/x", False)]


def test_gate_rfc9309_none_rules(spark):
    cands = spark.createDataFrame([("h1", "/x")], "host string, path string")
    row = gate_rfc9309(cands, None).collect()[0]
    assert row["allowed"] is True and row["rule"] is None
