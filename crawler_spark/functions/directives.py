"""Page-level crawl directives: meta-robots, anchor rel=nofollow,
rel=canonical — the in-page signals every production crawler honors
(REP meta extension, public Google/Bing documentation; Heritrix and
Nutch both implement them).

- ``meta_robots(html)`` → struct(noindex, nofollow): a ``noindex``
  page is fetched but excluded from results; a ``nofollow`` page
  contributes NO outlinks to the frontier. Multiple robots meta tags
  combine most-restrictively (the REP rule), and bare (unquoted)
  content values are accepted.
- ``extract_links(html)`` → array<struct<href, nofollow>>: per-anchor
  rel=nofollow (link-level frontier exclusion / zero link-graph
  weight).
- ``canonical_href(html)`` → the ``<link rel="canonical">`` target:
  the site's own duplicate-cluster label — grouping by the resolved
  canonical is the cheapest dedup signal there is (no content compare
  at all), and search-engine pipelines apply it before any similarity
  pass.

All pure JVM regexp/array expressions (map stage, no UDF). The href
VALUE grammar is imported from functions/links.py (one source of
truth); attribute NAMES are matched at whitespace boundaries so
``data-href`` / ``barrel=`` / ``rel=`` inside a URL value never count.
Matching is tolerant the way crawlers are: case-insensitive tags and
attrs, both quote styles, attribute order free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.functions.links import HREF_ATTR_RX, unquote_href

# all <a ...> attribute strings
_A_TAG_RX = r"(?i)<a\s([^>]*)>"
# rel attribute (at a name boundary) containing the nofollow token —
# the three value forms are matched separately because a BARE value
# ends at whitespace (a 'nofollow' in some later unquoted attribute
# must not leak into the rel value)
_NOFOLLOW_RX = (
    r"""(?i)(?<=[\s"'])rel\s*=\s*"""
    r"""(?:"[^">]*\bnofollow\b|'[^'>]*\bnofollow\b|[^\s>'"]*\bnofollow\b)"""
)
# <meta name=robots content=...> in either attribute order, quoted or
# bare values; group 1 = the whole content value token
_META_ROBOTS_RX = (
    r"""(?i)<meta\s(?=[^>]*(?<=[\s"'])name\s*=\s*["']?robots["'\s/>])"""
    r"""[^>]*(?<=[\s"'])content\s*=\s*("[^"]*"|'[^']*'|[^\s>'"]+)"""
)


def meta_robots(html: Column) -> Column:
    """struct(noindex boolean, nofollow boolean) from the page's
    ``<meta name="robots">`` content tokens. Absent tag → both false;
    several robots tags union their directives (most restrictive
    wins, per the REP)."""
    h = F.coalesce(html, F.lit(""))
    contents = F.transform(
        F.regexp_extract_all(h, F.lit(_META_ROBOTS_RX), 1),
        lambda t: F.lower(unquote_href(t)),
    )
    tok = lambda c, t: c.rlike(rf"(^|[\s,]){t}([\s,]|$)")  # noqa: E731
    return F.struct(
        F.exists(contents, lambda c: tok(c, "noindex") | tok(c, "none")).alias(
            "noindex"
        ),
        F.exists(contents, lambda c: tok(c, "nofollow") | tok(c, "none")).alias(
            "nofollow"
        ),
    )


def extract_links(html: Column) -> Column:
    """array<struct<href string, nofollow boolean>> — one entry per
    anchor tag with an href; per-link rel=nofollow flag."""
    tags = F.regexp_extract_all(F.coalesce(html, F.lit("")), F.lit(_A_TAG_RX), 1)
    # the attrs string starts right AFTER '<a ', so prepend one space
    # to give the first attribute the boundary the grammar requires
    padded = lambda t: F.concat(F.lit(" "), t)  # noqa: E731
    return F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                unquote_href(
                    F.regexp_extract(padded(t), HREF_ATTR_RX, 1)
                ).alias("href"),
                padded(t).rlike(_NOFOLLOW_RX).alias("nofollow"),
            ),
        ),
        # keep only anchors that actually carry an href (unlike
        # links.extract_hrefs, the empty string here means "no href
        # attribute", not an empty self-reference — the regex groups
        # can't distinguish href="" from no href, and crawlers treat
        # both as non-links for the follow decision)
        lambda s: F.length(s["href"]) > 0,
    )


# <link rel=canonical href=...> in either attribute order
_CANONICAL_RX = (
    r"""(?i)<link\s(?=[^>]*(?<=[\s"'])rel\s*=\s*["']?canonical["'\s/>])"""
    r"""[^>]*(?<=[\s"'])href\s*=\s*("[^"]*"|'[^']*'|[^\s>'"]+)"""
)


def canonical_href(html: Column) -> Column:
    """The raw ``<link rel="canonical">`` href (first one wins, as
    browsers and crawlers do), or NULL when absent; resolve with
    links.resolve_ref against the page URL."""
    h = F.coalesce(html, F.lit(""))
    raw = unquote_href(F.regexp_extract(h, _CANONICAL_RX, 1))
    return F.when(F.length(raw) > 0, raw)
