"""functions/directives.py — meta-robots, rel=nofollow, rel=canonical."""

from pyspark.sql import functions as F

from crawler_spark.functions.directives import (
    canonical_href,
    extract_links,
    meta_robots,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(col(F.col("html")).alias("o")).collect()[0]["o"]


def test_meta_robots_tokens(spark):
    cases = {
        '<meta name="robots" content="noindex, nofollow">': (True, True),
        "<META NAME='ROBOTS' CONTENT='NOINDEX'>": (True, False),
        '<meta name="robots" content="nofollow">': (False, True),
        '<meta name="robots" content="none">': (True, True),
        '<meta name="robots" content="index, follow">': (False, False),
        '<meta content="noindex" name="robots">': (True, False),  # order-free
        '<meta name="viewport" content="noindex">': (False, False),  # wrong tag
        "<p>no meta at all</p>": (False, False),
        "<meta name=robots content=noindex>": (True, False),  # bare values
        # multiple robots tags combine most-restrictively (REP)
        '<meta name="robots" content="noindex"><meta name="robots" content="nofollow">': (True, True),
        '<meta data-name="robots" content="noindex">': (False, False),  # name boundary
    }
    for html, (ni, nf) in cases.items():
        got = _one(spark, f"<html><head>{html}</head></html>", meta_robots)
        assert (got["noindex"], got["nofollow"]) == (ni, nf), html
    got = _one(spark, None, meta_robots)
    assert (got["noindex"], got["nofollow"]) == (False, False)


def test_meta_robots_token_boundaries(spark):
    # 'nofollowme' must not match the nofollow token
    got = _one(
        spark,
        '<meta name="robots" content="nofollowme">',
        meta_robots,
    )
    assert got["nofollow"] is False


def test_extract_links_nofollow(spark):
    html = (
        '<a href="/a">f</a>'
        '<a rel="nofollow" href="/b">n</a>'
        "<a href='/c' rel='ugc nofollow'>n2</a>"
        '<a rel="noopener" href="/d">f2</a>'
        "<a name=anchor>no href</a>"
    )
    got = [(r["href"], r["nofollow"]) for r in _one(spark, html, extract_links)]
    assert got == [("/a", False), ("/b", True), ("/c", True), ("/d", False)]


def test_attribute_name_boundaries(spark):
    # data-href must not steal the real href; 'rel=' inside an href
    # value or a 'barrel=' attribute must not mark the link nofollow
    html = (
        '<a data-href="/tracked" href="/real">x</a>'
        '<a href="/x?rel=nofollow">y</a>'
        '<a href="/y" barrel=nofollow>z</a>'
    )
    got = [(r["href"], r["nofollow"]) for r in _one(spark, html, extract_links)]
    assert got == [("/real", False), ("/x?rel=nofollow", False), ("/y", False)]


def test_bare_rel_value_ends_at_whitespace(spark):
    # an unquoted rel value ends at whitespace: 'nofollow' in a LATER
    # unquoted attribute must not leak into the rel value
    html = (
        '<a href="/p" rel=me data-note=nofollow>x</a>'
        '<a href="/q" rel=nofollow title=t>y</a>'
    )
    got = [(r["href"], r["nofollow"]) for r in _one(spark, html, extract_links)]
    assert got == [("/p", False), ("/q", True)]


def test_href_after_closing_quote(spark):
    # browsers parse title="t"href="/y" as two attributes; both parsers
    # must agree (the shared-grammar guarantee)
    from crawler_spark.functions.links import extract_hrefs

    html = '<a title="t"href="/y">x</a>'
    assert _one(spark, html, extract_hrefs) == ["/y"]
    assert [(r["href"], r["nofollow"]) for r in _one(spark, html, extract_links)] == [
        ("/y", False)
    ]


def test_canonical_href(spark):
    assert (
        _one(spark, '<link rel="canonical" href="https://e.com/x">', canonical_href)
        == "https://e.com/x"
    )
    # attribute order reversed + single quotes
    assert (
        _one(spark, "<link href='/y' rel='canonical'>", canonical_href) == "/y"
    )
    # first canonical wins
    html = '<link rel="canonical" href="/one"><link rel="canonical" href="/two">'
    assert _one(spark, html, canonical_href) == "/one"
    # stylesheet link is not canonical
    assert _one(spark, '<link rel="stylesheet" href="/s.css">', canonical_href) is None
    assert _one(spark, None, canonical_href) is None
