"""Deterministic pages table derived from the driver's ``documents``
testdata — the flagship query's input when running against
``/root/testdata/sf*`` (TESTDATA.md) instead of the synthetic crawl
corpus (sources/corpus.py).

Each document is wrapped in HTML with a planted detector class keyed on
``doc_id % 10`` (0-1 high, 2-3 medium, 4 low, 5-9 negative), mirroring
the reference's inline fixture (/root/reference/examples/
test_components.py:127-143) and pattern bank (/root/reference/src/
detectors/nextjs.py:22-51). The construction rule doubles as the DuckDB
oracle (oracle/sqlgen.sql_flagship), giving the full flagship plan —
scan → Arrow detector UDF → confidence gate → dedupe → project — an
exact value-level correctness check.

Built-in column functions only; the expensive work (detection) stays in
the one Arrow UDF stage of plans/flagship.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HIGH_HTML = (
    '<html><head><script src="/_next/static/{bid}/_buildManifest.js"></script>'
    '</head><body><div id="__next"><p>{body}</p></div>'
    '<script id="__NEXT_DATA__" type="application/json">'
    '{{"props":{{}},"buildId":"{bid}"}}</script></body></html>'
)
_MEDIUM_HTML = (
    '<html><body><div class="next-route-announcer" role="alert"></div>'
    "<p>{body}</p></body></html>"
)
_LOW_HTML = '<html><body><a href="/_next/canary">x</a><p>{body}</p></body></html>'
_NEG_HTML = "<html><head><title>d</title></head><body><p>{body}</p></body></html>"


def _fmt(template: str, bid=None):
    """Template → concat() column, with {body}/{bid} spliced as columns."""
    import re

    parts = re.split(r"(\{body\}|\{bid\})", template.replace("{{", "\0").replace("}}", "\1"))
    cols = []
    for p in parts:
        if p == "{body}":
            cols.append(F.col("text"))
        elif p == "{bid}":
            cols.append(bid)
        elif p:
            cols.append(F.lit(p.replace("\0", "{").replace("\1", "}")))
    return F.concat(*cols)


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) → pages with the schema
    plans/flagship.classify_bulk expects."""
    m = F.col("doc_id") % 10
    bid = F.concat(F.lit("bld"), F.col("doc_id").cast("string"))
    page = (
        F.when(m < 2, _fmt(_HIGH_HTML, bid))
        .when(m < 4, _fmt(_MEDIUM_HTML))
        .when(m == 4, _fmt(_LOW_HTML))
        .otherwise(_fmt(_NEG_HTML))
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.to_timestamp(F.lit("2026-01-01")) + F.make_interval(secs=F.col("doc_id"))).alias(
            "warc_ts"
        ),
        F.encode(page, "utf-8").alias("html"),
        page.alias("text"),
        F.col("lang"),
        F.col("source").alias("warc_source"),
        F.col("doc_id").alias("warc_offset"),
        F.lit("text/html; charset=utf-8").alias("mime"),
        F.lit(200).alias("status"),
        F.lit("response").alias("rec_type"),
    )
