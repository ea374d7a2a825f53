"""Outlink extraction: HTML ``href`` harvesting + RFC 3986 reference
resolution, fully JVM-side (regexp + array fold — no Python UDF).

This is the front end of frontier expansion the reference never needs
(it reads links from Common Crawl's pre-built indexes; our frontier
loop consumes a ``links`` table, frontier.py:18): fetched pages →
``<a href>`` references → absolute canonical URLs.

Resolution follows RFC 3986 §5 (public spec; verified against CPython's
``urllib.parse.urljoin`` on the RFC's own §5.4 example bank in
tests/test_links.py):

- absolute references (with scheme) pass through; non-http(s) schemes
  (mailto:, javascript:, data:) resolve to NULL and are filtered;
- network-path references (``//host/…``) take the base scheme;
- absolute-path, query-only, fragment-only and relative-path references
  merge with the base; dot segments (``.``/``..``) are removed by ONE
  ``F.aggregate`` fold over the split path — a per-row O(segments) JVM
  pass, the same pattern as the robots.txt fold;
- fragments are always dropped (a crawl frontier never fetches them).

Precondition: ``base`` is an absolute http(s) URL — true by
construction here, pages enter the store through canonicalization.

Scale: extraction + resolution is a pure map stage (explode of a
regexp_extract_all); the only shuffle in outlink flows is whatever the
consumer does next (dedupe/anti-join), exactly as frontier.py plans it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The shared href-attribute grammar (also consumed by
# functions/directives.py so the two parsers can never drift): the
# attribute NAME must sit at a whitespace boundary — without the
# lookbehind, 'data-href="/t"' would satisfy the match and steal the
# real href. Group 1 is the whole VALUE TOKEN (quotes included for the
# quoted forms); unquote_href strips them.
HREF_ATTR_RX = r"""(?i)(?<=[\s"'])href\s*=\s*("[^"]*"|'[^']*'|[^\s>'"]+)"""
# href="..." / href='...' / href=bare inside an <a> tag
_HREF_RX = r"""(?i)<a\s[^>]*?(?<=[\s"'])href\s*=\s*("[^"]*"|'[^']*'|[^\s>'"]+)"""

_SCHEME_RX = "^[A-Za-z][A-Za-z0-9+.-]*:"


def unquote_href(token: Column) -> Column:
    """Strip the surrounding quotes from an href value token matched by
    the grammar above (bare tokens pass through)."""
    quoted = token.startswith('"') | token.startswith("'")
    return F.when(
        quoted, F.substring(token, F.lit(2), F.length(token) - 2)
    ).otherwise(token)


def extract_hrefs(html: Column) -> Column:
    """``array<string>`` of raw href values from anchor tags (both
    quote styles and bare values; empty hrefs kept — the resolver maps
    them to the base). NULL html → empty array. ONE regex scan of the
    page (this is the hot per-page map stage); unquoting is a cheap
    per-element transform."""
    tokens = F.regexp_extract_all(F.coalesce(html, F.lit("")), F.lit(_HREF_RX), 1)
    return F.transform(tokens, unquote_href)


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path (leading ``/``): one fold,
    ``..`` pops, ``.`` and trailing dot-segments keep directory form."""
    parts = F.split(F.substring(path, 2, 2_000_000_000), "/")
    folded = F.aggregate(
        parts,
        F.array().cast("array<string>"),
        lambda acc, p: F.when(p == "..", F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))))
        .when(p == ".", acc)
        .otherwise(F.array_append(acc, p)),
    )
    # a trailing '.' or '..' resolves to a directory → restore the slash
    last = F.element_at(parts, -1)
    folded = F.when(
        last.isin(".", ".."), F.array_append(folded, F.lit(""))
    ).otherwise(folded)
    return F.concat(F.lit("/"), F.array_join(folded, "/"))


def resolve_ref(base: Column, ref: Column) -> Column:
    """Absolute http(s) URL for reference ``ref`` against ``base``
    (fragment dropped), or NULL for non-http(s) schemes.

    Implements RFC 3986 §5.3 composition for the reference classes a
    crawler meets; ``base`` must be absolute http(s).
    """
    r = F.trim(ref)
    # strip any fragment from the reference up front
    r_nofrag = F.regexp_extract(r, "^([^#]*)", 1)
    r_path = F.regexp_extract(r_nofrag, "^([^?]*)", 1)
    # query = everything from the FIRST '?' (a query may itself contain
    # further '?' characters — they are literal)
    r_query = F.when(
        F.instr(r_nofrag, "?") > 0,
        F.substring(r_nofrag, F.instr(r_nofrag, "?"), F.lit(2_000_000_000)),
    ).otherwise(F.lit(""))

    b_nofrag = F.regexp_extract(base, "^([^#]*)", 1)
    b_scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    b_root = F.regexp_extract(b_nofrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    b_path = F.regexp_extract(b_nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # base directory: up to and including the last '/' (or '/' if none)
    b_dir = F.when(
        F.instr(b_path, "/") > 0,
        F.regexp_extract(b_path, "^(.*/)", 1),
    ).otherwise(F.lit("/"))

    has_scheme = r.rlike(_SCHEME_RX)
    r_scheme = F.lower(F.regexp_extract(r, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))

    return (
        F.when(
            has_scheme,
            F.when(r_scheme.isin("http", "https"), r_nofrag).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .when(r.startswith("//"), F.concat(b_scheme, F.lit(":"), r_nofrag))
        .when(r_nofrag == "", b_nofrag)
        # query-only ref: T.path = base.path VERBATIM (RFC 3986 §5.3) —
        # including an empty path ('https://h?q'), matching urljoin
        .when(r.startswith("?"), F.concat(b_root, b_path, r_query))
        .when(
            r.startswith("/"),
            F.concat(b_root, _remove_dot_segments(r_path), r_query),
        )
        .otherwise(
            F.concat(
                b_root,
                _remove_dot_segments(F.concat(b_dir, r_path)),
                r_query,
            )
        )
    )


def outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url): every resolvable http(s) outlink of every
    page — explode of the href array, resolved against the page URL.
    Pure map stage; dedupe/canonicalize downstream."""
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(extract_hrefs(F.col(html_col))).alias("_ref"),
        )
        .select(
            "src_url",
            resolve_ref(F.col("src_url"), F.col("_ref")).alias("dst_url"),
        )
        .where(F.col("dst_url").isNotNull())
    )
