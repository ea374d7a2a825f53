"""Page-level crawl directives: meta-robots, anchor rel=nofollow,
rel=canonical — the in-page signals every production crawler honors
(REP meta extension, public Google/Bing documentation; Heritrix and
Nutch both implement them).

- ``meta_robots(html)`` → struct(noindex, nofollow): a ``noindex``
  page is fetched but excluded from results; a ``nofollow`` page
  contributes NO outlinks to the frontier.
- ``extract_links(html)`` → array<struct<href, nofollow>>: per-anchor
  rel=nofollow (link-level frontier exclusion / zero link-graph
  weight).
- ``canonical_href(html)`` → the ``<link rel="canonical">`` target:
  the site's own duplicate-cluster label — grouping by the resolved
  canonical is the cheapest dedup signal there is (no content compare
  at all), and search-engine pipelines apply it before any similarity
  pass.

All pure JVM regexp/array expressions (map stage, no UDF), same policy
as functions/links.py. Matching is tolerant the way crawlers are:
case-insensitive tags/attrs, both quote styles, attribute order free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# all <a ...> attribute strings
_A_TAG_RX = r"(?i)<a\s([^>]*)>"
# href value out of ONE tag's attribute string
_HREF_IN_TAG_RX = r"""(?i)href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"]+))"""
# rel attribute containing the nofollow token
_NOFOLLOW_RX = r"""(?i)rel\s*=\s*["']?[^"'>]*\bnofollow\b"""
# <meta name=robots content=...> in either attribute order
_META_ROBOTS_RX = (
    r"""(?i)<meta\s(?=[^>]*name\s*=\s*["']?robots["'\s>])"""
    r"""[^>]*content\s*=\s*(?:"([^"]*)"|'([^']*)')"""
)
# <link rel=canonical href=...> in either attribute order
_CANONICAL_RX = (
    r"""(?i)<link\s(?=[^>]*rel\s*=\s*["']?canonical["'\s>])"""
    r"""[^>]*href\s*=\s*(?:"([^"]*)"|'([^']*)')"""
)


def _first_group(*cols: Column) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = F.when(F.length(out) > 0, out).otherwise(c)
    return out


def meta_robots(html: Column) -> Column:
    """struct(noindex boolean, nofollow boolean) from the page's
    ``<meta name="robots">`` content tokens (absent tag → both false)."""
    h = F.coalesce(html, F.lit(""))
    content = F.lower(
        _first_group(
            F.regexp_extract(h, _META_ROBOTS_RX, 1),
            F.regexp_extract(h, _META_ROBOTS_RX, 2),
        )
    )
    tok = lambda t: content.rlike(rf"(^|[\s,]){t}([\s,]|$)")  # noqa: E731
    return F.struct(
        (tok("noindex") | tok("none")).alias("noindex"),
        (tok("nofollow") | tok("none")).alias("nofollow"),
    )


def extract_links(html: Column) -> Column:
    """array<struct<href string, nofollow boolean>> — one entry per
    anchor tag with an href; per-link rel=nofollow flag."""
    tags = F.regexp_extract_all(F.coalesce(html, F.lit("")), F.lit(_A_TAG_RX), 1)
    return F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                _first_group(
                    F.regexp_extract(t, _HREF_IN_TAG_RX, 1),
                    F.regexp_extract(t, _HREF_IN_TAG_RX, 2),
                    F.regexp_extract(t, _HREF_IN_TAG_RX, 3),
                ).alias("href"),
                t.rlike(_NOFOLLOW_RX).alias("nofollow"),
            ),
        ),
        # keep only anchors that actually carry an href (unlike
        # links.extract_hrefs, the empty string here means "no href
        # attribute", not an empty self-reference — the regex groups
        # can't distinguish href="" from no href, and crawlers treat
        # both as non-links for the follow decision)
        lambda s: F.length(s["href"]) > 0,
    )


def canonical_href(html: Column) -> Column:
    """The raw ``<link rel="canonical">`` href (first one wins, as
    browsers and crawlers do), or NULL when absent; resolve with
    links.resolve_ref against the page URL."""
    h = F.coalesce(html, F.lit(""))
    raw = _first_group(
        F.regexp_extract(h, _CANONICAL_RX, 1),
        F.regexp_extract(h, _CANONICAL_RX, 2),
    )
    return F.when(F.length(raw) > 0, raw)
