"""Golden HTML fixtures per detector tier (FIXTURES.md; modeled on the
reference's inline fixture at examples/test_components.py:127-143 and the
pattern bank src/detectors/nextjs.py:22-51)."""

# High tier: __NEXT_DATA__ script + __next div + buildId + static asset +
# next-head-count meta + version string — everything at once.
HIGH_FULL = """<!DOCTYPE html>
<html>
<head>
    <meta name="next-head-count" content="3">
    <title>Next.js Test</title>
    <script src="/_next/static/chunks/webpack-abc123.js"></script>
    <script src="/_next/static/kDqJqwirPzuHuMVWaE2Oq/_buildManifest.js"></script>
</head>
<body>
    <div id="__next">
        <h1>Powered by Next.js v13.4.1</h1>
    </div>
    <script id="__NEXT_DATA__" type="application/json">
        {"props":{},"page":"/","buildId":"kDqJqwirPzuHuMVWaE2Oq"}
    </script>
</body>
</html>"""

# High via a single high-tier marker only.
HIGH_MINIMAL = '<html><body><script>window.__NEXT_DATA__ = {};</script></body></html>'

# Medium-only: one medium marker (score 2), no high, no build-id path with
# trailing slash, no meta.
MEDIUM_ONLY = '<html><body><div class="next-route-announcer" role="alert"></div></body></html>'

# Two mediums → sum 4 → still medium; three mediums → sum 6 → high.
MEDIUM_TWO = '<html><body><span>__BUILD_MANIFEST</span><span>__NEXT_P</span></body></html>'
MEDIUM_THREE = (
    '<html><body><span>__BUILD_MANIFEST</span><span>__NEXT_P</span>'
    '<img src="/_next/image?url=x"></body></html>'
)

# Low-only: bare /_next/ (no static/ suffix → no build id), one low marker.
# NOTE: '/_next/data/x' would also match the low pattern; use a plain path.
LOW_ONLY = '<html><body><a href="/_next/x">x</a></body></html>'

# Low via word 'nextjs' in a comment; plus 'next.js' → two lows, sum 2 → low.
LOW_COMMENT = "<html><body><!-- built with nextjs --></body></html>"
LOW_TWO = "<html><body><!-- nextjs is next.js --></body></html>"
# three lows: sum 3 → medium (truth table: sum>=3).
LOW_THREE = '<html><body><!-- nextjs next.js --><a href="/_next/x">y</a></body></html>'

# Adversarial negatives (FIXTURES.md): these DO match the low regexes
# ('nextjs' has no word boundary in the reference), pinning the reference's
# false-positive-ish behavior.
ADVERSARIAL_PROSE = "<html><body><p>The renextjsify project is unrelated.</p></body></html>"
ADVERSARIAL_JS_IDENT = "<html><script>var my__next_value = 1;</script></html>"

NEGATIVE = "<html><head><title>plain</title></head><body><p>hello</p></body></html>"
NON_HTML_JSON = '{"a": 1, "b": [2, 3]}'
EMPTY = ""

# Case-sensitivity pins: bank is IGNORECASE, build-id/version are NOT.
CASE_BANK = "<html><body>__next_data__ lowercase marker</body></html>"  # matches high
CASE_BUILD_ID_MISS = '<html><script src="/_NEXT/STATIC/abc/x.js"></script></html>'
CASE_VERSION_MISS = "<html><body>NEXT.JS V13.4.1</body></html>"

ALL = {
    "high_full": HIGH_FULL,
    "high_minimal": HIGH_MINIMAL,
    "medium_only": MEDIUM_ONLY,
    "medium_two": MEDIUM_TWO,
    "medium_three": MEDIUM_THREE,
    "low_only": LOW_ONLY,
    "low_comment": LOW_COMMENT,
    "low_two": LOW_TWO,
    "low_three": LOW_THREE,
    "adversarial_prose": ADVERSARIAL_PROSE,
    "adversarial_js": ADVERSARIAL_JS_IDENT,
    "negative": NEGATIVE,
    "non_html": NON_HTML_JSON,
    "empty": EMPTY,
    "case_bank": CASE_BANK,
    "case_build_id_miss": CASE_BUILD_ID_MISS,
    "case_version_miss": CASE_VERSION_MISS,
}
