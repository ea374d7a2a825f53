"""Soft-404 detection tests."""

from __future__ import annotations

from crawler_spark.operators.soft404 import (
    SOFT404_MIN_MASS,
    soft404_verdicts,
)


def _verdicts(spark, rows):
    pages = spark.createDataFrame(rows, ["doc_id", "status", "text"])
    return {r["doc_id"]: r for r in soft404_verdicts(pages).collect()}


def test_soft404_error_body_with_200_is_flagged(spark):
    got = _verdicts(
        spark,
        [
            (0, 200, "error 404 page not found sorry"),
            (1, 200, "perfectly normal article body here"),
            (2, 404, "error 404 page not found sorry"),
        ],
    )
    assert got[0]["verdict"] == "soft404"
    assert got[0]["marker_mass"] >= SOFT404_MIN_MASS
    assert got[1]["verdict"] == "ok" and got[1]["marker_mass"] == 0
    # an honest 404 is a hard404 no matter the body
    assert got[2]["verdict"] == "hard404"


def test_soft404_single_marker_below_threshold_stays_ok(spark):
    # one incidental "404" in a normal article must not flag the page
    got = _verdicts(spark, [(0, 200, "the room number was 404 upstairs")])
    assert got[0]["marker_mass"] == 1
    assert got[0]["verdict"] == "ok"


def test_soft404_phrase_markers_count_as_phrases(spark):
    # "page does not exist" is one phrase occurrence, not four words
    got = _verdicts(spark, [(0, 200, "this page does not exist anymore 404")])
    assert got[0]["marker_mass"] == 2
    assert got[0]["verdict"] == "soft404"
