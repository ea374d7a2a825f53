"""functions/links.py — href extraction + RFC 3986 reference resolution.

The resolver is verified against CPython's ``urllib.parse.urljoin``
(fragments stripped — the crawler never fetches them) on the RFC's own
§5.4 normal + abnormal example bank plus crawl-realistic extras.
"""

from urllib.parse import urldefrag, urljoin

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.links import extract_hrefs, outlinks, resolve_ref

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 + §5.4.2 (minus 'http:g', asserted separately: we are
# a strict parser) + crawl extras
REFS = [
    "g", "./g", "g/", "/g", "//g", "?y", "g?y", "#s", "g#s", ";x", "g;x",
    "", ".", "./", "..", "../", "../g", "../..", "../../", "../../g",
    "../../../g", "../../../../g", "/./g", "/../g", "g.", ".g", "g..",
    "..g", "./../g", "./g/.", "g/./h", "g/../h", "g;x=1/./y",
    "g;x=1/../y", "g?y/./x", "g#s/./x",
    # crawl extras: ports, literal '?' inside the query, deep bases
    # handled via second base below
    "//h:8080/x", "sub/page.html?a=1#frag", "g?a?b", "?x?y",
]


@pytest.mark.parametrize("base", [BASE, "https://h:8080/deep/path/page.html?x=1"])
def test_resolution_matches_urljoin(spark, base):
    df = spark.createDataFrame([(base, r) for r in REFS], "base string, ref string")
    got = {
        r["ref"]: r["out"]
        for r in df.select("ref", resolve_ref(F.col("base"), F.col("ref")).alias("out")).collect()
    }
    for ref in REFS:
        expected = urldefrag(urljoin(base, ref))[0]
        assert got[ref] == expected, f"base={base} ref={ref!r}: {got[ref]} != {expected}"


def test_non_http_schemes_resolve_to_null(spark):
    refs = ["mailto:x@y.z", "javascript:void(0)", "data:text/plain,hi", "ftp://h/f", "a:b"]
    df = spark.createDataFrame([(BASE, r) for r in refs], "base string, ref string")
    out = df.select(resolve_ref(F.col("base"), F.col("ref")).alias("o")).collect()
    assert all(r["o"] is None for r in out)


def test_strict_scheme_ref(spark):
    # RFC 3986 strict parsers keep 'http:g' as-is (urljoin is the
    # backwards-compatible exception)
    df = spark.createDataFrame([(BASE, "http:g")], "base string, ref string")
    assert df.select(resolve_ref(F.col("base"), F.col("ref")).alias("o")).collect()[0]["o"] == "http:g"


HTML = """
<html><body>
<a href="/abs/path">x</a>
<A HREF='single.html'>y</A>
<a class="z" href=bare.html>b</a>
<a href="">self</a>
<a href="#frag">frag</a>
<a href="mailto:x@y">mail</a>
<a name="anchor-no-href">n</a>
<area href="/not-an-anchor">m</area>
</body></html>
"""


def test_extract_hrefs(spark):
    df = spark.createDataFrame([(HTML,)], "html string")
    arr = df.select(extract_hrefs(F.col("html")).alias("a")).collect()[0]["a"]
    assert arr == ["/abs/path", "single.html", "bare.html", "", "#frag", "mailto:x@y"]


def test_extract_hrefs_name_boundary(spark):
    # an attribute merely ENDING in 'href' (data-href) must not match —
    # the real href must be extracted, not the tracking stub
    df = spark.createDataFrame(
        [('<a data-href="/tracked" href="/real">x</a>',)], "html string"
    )
    arr = df.select(extract_hrefs(F.col("html")).alias("a")).collect()[0]["a"]
    assert arr == ["/real"]


def test_outlinks_end_to_end(spark):
    pages = spark.createDataFrame(
        [("https://ex.com/dir/page.html", HTML), ("https://ex.com/p2", None)],
        "url string, html string",
    )
    got = sorted(r["dst_url"] for r in outlinks(pages).collect())
    assert got == sorted(
        [
            "https://ex.com/abs/path",
            "https://ex.com/dir/single.html",
            "https://ex.com/dir/bare.html",
            "https://ex.com/dir/page.html",  # empty href -> base
            "https://ex.com/dir/page.html",  # fragment-only -> base
            # mailto dropped
        ]
    )


def test_outlinks_is_pure_map_stage(spark):
    pages = spark.createDataFrame(
        [("https://ex.com/p", HTML)], "url string, html string"
    )
    plan = outlinks(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: extraction is a map
    assert "PythonUDF" not in plan  # and fully JVM-side
