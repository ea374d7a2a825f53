"""Next.js meta-tag extraction over raw HTML, stdlib-only.

Semantics of the reference's ``_extract_meta_tags``
(/root/reference/src/detectors/nextjs.py:161-193), which uses
BeautifulSoup+lxml:

- collect every ``<meta>`` whose ``name`` (falling back to ``property``)
  contains one of META_NAME_SUBSTRINGS case-insensitively → {name: content}
- ``<div id="__next">`` anywhere            → {'__next_root': 'found'}
- ``<script id="__NEXT_DATA__">`` anywhere  → {'__NEXT_DATA__': 'found'}
- any parse failure → {}

bs4/lxml are not in this runtime, so this is a deliberate stdlib
``html.parser`` re-implementation of the same contract (documented
deviation: malformed-HTML edge handling follows html.parser, not lxml;
on the well-formed fixture corpus the two agree). The same function is
used by both the row-at-a-time oracle and the vectorized UDF — HTML
parsing is inherently per-document, exactly as in the reference.
"""

from __future__ import annotations

from html.parser import HTMLParser

from crawler_spark.patterns import META_NAME_SUBSTRINGS

# Cheap pre-gate: a document whose lowercased text contains none of these
# substrings cannot yield a non-empty meta_tags map (every rule above
# requires one of them to appear literally). The reference parses every
# document unconditionally; skipping guaranteed-empty ones is a pure
# optimization with identical output.
_PREGATE_SUBSTRINGS = ("__next", "next-head-count", "next-font")


def may_have_meta(html_lower: str) -> bool:
    return any(s in html_lower for s in _PREGATE_SUBSTRINGS)


class _MetaScanner(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta_tags: dict[str, str] = {}
        self.next_root = False
        self.next_data_script = False

    def _handle(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "meta":
            d = dict(attrs)
            name = d.get("name") or d.get("property") or ""
            content = d.get("content") or ""
            low = name.lower()
            for pat in META_NAME_SUBSTRINGS:
                if pat.lower() in low:
                    self.meta_tags[name] = content
        elif tag == "div":
            if dict(attrs).get("id") == "__next":
                self.next_root = True
        elif tag == "script":
            if dict(attrs).get("id") == "__NEXT_DATA__":
                self.next_data_script = True

    def handle_starttag(self, tag, attrs):  # noqa: D102
        self._handle(tag, attrs)

    def handle_startendtag(self, tag, attrs):  # noqa: D102
        self._handle(tag, attrs)


def extract_meta_tags(html: str) -> dict[str, str]:
    """Extract Next.js-related meta tags; {} on any failure."""
    if not html or not may_have_meta(html.lower()):
        return {}
    try:
        scanner = _MetaScanner()
        scanner.feed(html)
        tags = scanner.meta_tags
        if scanner.next_root:
            tags["__next_root"] = "found"
        if scanner.next_data_script:
            tags["__NEXT_DATA__"] = "found"
        return tags
    except Exception:
        return {}
