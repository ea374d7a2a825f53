"""Sitemap ingestion — the crawler's third URL source after seeds+links.

The sitemaps.org protocol (public spec, referenced from robots.txt
``Sitemap:`` lines) is how hosts ADVERTISE their URL space: ``<urlset>``
documents carry ``<url><loc/><lastmod/><changefreq/><priority/></url>``
entries, ``<sitemapindex>`` documents list child sitemaps. A production
crawler folds sitemap URLs into the frontier with the advertised
priority and uses ``lastmod`` to seed the recrawl scheduler
(operators/crawlreport.py) without a fetch.

Spark-first parse: sitemaps are flat, schemaless-in-practice XML, and
the entries are independent — so the parse is a pure JVM map stage:
``explode(split(xml, '</url>'))`` gives one fragment per entry, then
``regexp_extract`` pulls loc/lastmod/priority from each fragment. No
XML library, no Python UDF, no shuffle; a 50k-URL sitemap becomes 50k
rows inside WholeStageCodegen. (A DOM parse would be row-at-a-time
Python for no benefit: the protocol caps files at 50k URLs / 50 MB and
entry elements cannot nest.) Gzip'd sitemaps (.xml.gz) flow through the
same tolerant-gunzip decode stage as pages before reaching this parse.

Priority is kept as integer parts-per-million (protocol default 0.5 →
500000) — same integer-exactness convention as the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_DEFAULT_PRIORITY_PPM = 500_000  # spec: "default priority is 0.5"


def _xml_unescape(col: F.Column) -> F.Column:
    """Decode XML escapes for the five chars the spec requires escaping
    — named entities AND their numeric character references (decimal
    with optional leading zeros, hex case-insensitive), since common
    serializers emit '&#38;' as readily as '&amp;'. Locs are URLs
    (ASCII), so these five are the only codepoints a conformant sitemap
    ever escapes; arbitrary numeric refs would need a UDF and have no
    legitimate occurrence in a loc. The ampersand forms decode LAST so
    '&amp;lt;' correctly becomes the literal '&lt;'."""
    for pat, ch in (
        (r"&#0*60;|&#[xX]0*3[cC];", "<"),
        (r"&#0*62;|&#[xX]0*3[eE];", ">"),
        (r"&#0*34;|&#[xX]0*22;", '"'),
        (r"&#0*39;|&#[xX]0*27;", "'"),
    ):
        col = F.regexp_replace(col, pat, ch)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    col = F.regexp_replace(col, r"&#0*38;|&#[xX]0*26;", "&")
    return F.replace(col, F.lit("&amp;"), F.lit("&"))


def _frag_field(tag: str) -> F.Column:
    return _xml_unescape(
        F.regexp_extract("_frag", rf"<{tag}>\s*([^<]+?)\s*</{tag}>", 1)
    )


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, xml) → one row per ``<url>`` entry: (host, loc, lastmod,
    priority_ppm). Missing lastmod → NULL; missing priority → the spec
    default. Entries without a ``<loc>`` (trailing fragments, malformed
    entries) are dropped — tolerant, like every crawl-store reader
    here."""
    frags = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</url>")).alias("_frag"),
    )
    pr = _frag_field("priority")
    return (
        frags.select(
            "host",
            _frag_field("loc").alias("loc"),
            F.when(_frag_field("lastmod") == "", None)
            .otherwise(_frag_field("lastmod"))
            .alias("lastmod"),
            # rlike guard keeps the cast lazy: a present-but-non-numeric
            # priority (or a missing one) falls back to the spec default
            # instead of NULLing (or, under ANSI, crashing) the row —
            # tolerant-reader contract
            F.when(
                pr.rlike(r"^[0-9]*\.?[0-9]+$"),
                F.round(pr.cast("double") * 1_000_000).cast("long"),
            )
            .otherwise(F.lit(SITEMAP_DEFAULT_PRIORITY_PPM))
            .alias("priority_ppm"),
        )
        .where(F.col("loc") != "")
    )


def parse_sitemap_index(
    indexes: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, xml) of ``<sitemapindex>`` docs → (host, child_loc,
    lastmod): the fetch-next list for the sitemap crawl loop."""
    frags = indexes.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</sitemap>")).alias("_frag"),
    )
    return (
        frags.select(
            "host",
            _frag_field("loc").alias("child_loc"),
            F.when(_frag_field("lastmod") == "", None)
            .otherwise(_frag_field("lastmod"))
            .alias("lastmod"),
        )
        .where(F.col("child_loc") != "")
    )


def synth_sitemaps(docs: DataFrame) -> DataFrame:
    """One synthetic sitemap per source host over the documents table:
    every doc mints a ``<url>`` entry, odd docs carry a lastmod, every
    third doc carries an explicit priority. Entry order inside the XML
    is collect_list-nondeterministic — irrelevant, because the parse
    output is a row SET and both engines derive the same set."""
    entry = F.concat(
        F.lit("<url><loc>https://"),
        "source",
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc>"),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(
                F.lit("<lastmod>2026-01-"),
                F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<priority>0."),
                (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    return (
        docs.select(
            F.concat("source", F.lit(".example.com")).alias("host"),
            entry.alias("_e"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.concat_ws("", F.collect_list("_e")),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
