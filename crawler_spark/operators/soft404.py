"""Soft-404 detection — error pages served with status 200.

Bar-Yossef, Broder, Kumar, Tomkins, "Sic transit gloria telae: towards
an understanding of the web's decay" (WWW 2004, public) measured that
a large share of dead pages don't return 404 — they return 200 with an
error body ("soft 404s"), which silently poison both the crawl
frontier (the crawler keeps scheduling a dead subtree) and the
training corpus (thousands of near-identical "page not found" bodies).
The paper's detector probes a random sibling URL; the in-corpus
operator here is the content-signature form every pipeline actually
runs: count error-phrase markers in the body and cross-check the
status code.

Verdicts: ``hard404`` (non-200 status — the honest case), ``soft404``
(status 200 with marker mass ≥ SOFT404_MIN_MASS), ``ok``. Downstream:
soft404s are dropped from the corpus AND fed to the frontier's
demotion tier (same consumer as trap_detect).

Scale shape: one pure-JVM projection per row (the replace-length
occurrence trick — no regex engine, identical in DuckDB) + the final
verdict CASE; no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import occurrences

# Marker phrases counted in the body (space-delimited occurrence
# semantics — the corpus text is single-space tokenized).
SOFT404_MARKERS = ("404", "not found", "page does not exist", "no longer available")
SOFT404_MIN_MASS = 2


def marker_mass(text: Column) -> Column:
    m = F.lit(0).cast("long")
    for w in SOFT404_MARKERS:
        m = m + occurrences(text, w)
    return m


def soft404_verdicts(
    pages: DataFrame,
    id_col: str = "doc_id",
    status_col: str = "status",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status, marker_mass, verdict) for every page."""
    mass = marker_mass(F.col(text_col))
    verdict = (
        F.when(F.col(status_col) != 200, "hard404")
        .when(mass >= SOFT404_MIN_MASS, "soft404")
        .otherwise("ok")
    )
    return pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(status_col).cast("int").alias("status"),
        mass.alias("marker_mass"),
        verdict.alias("verdict"),
    )


def soft404_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: deterministic page synthesis (m = doc_id % 10) —
    m=0 an error body served as 200 (the soft 404), m=1 an honest 404,
    m=2 a 'no longer available' takedown page as 200, else the original
    document — then the verdict projection. The oracle rebuilds the
    same synthesis closed-form."""
    m = F.col("doc_id") % 10
    text2 = (
        F.when(
            m == 0,
            F.concat(
                F.lit("error 404 page not found - the page does not exist "),
                F.col("text"),
            ),
        )
        .when(
            m == 2,
            F.concat(F.lit("content no longer available 404 "), F.col("text")),
        )
        .otherwise(F.col("text"))
    )
    status = F.when(m == 1, F.lit(404)).otherwise(F.lit(200))
    pages = docs.select(
        "doc_id", status.alias("status"), text2.alias("text")
    )
    return soft404_verdicts(pages)
