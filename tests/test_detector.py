"""Detector: vectorized pandas path vs row-at-a-time oracle, plus golden
expectations pinning the reference scoring truth table
(/root/reference/src/detectors/nextjs.py:125-131)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.detector import detect_frame, detect_udf
from crawler_spark.oracle import detect as oracle_detect
from tests.fixtures_html import ALL

EXPECTED_CONFIDENCE = {
    "high_full": "high",
    "high_minimal": "high",
    "medium_only": "medium",
    "medium_two": "medium",
    "medium_three": "high",  # sum of scores ≥ 5
    "low_only": "low",
    "low_comment": "low",
    "low_two": "low",
    "low_three": "medium",  # sum ≥ 3
    "adversarial_prose": "low",  # 'nextjs' has no word boundary in the bank
    "adversarial_js": None,
    "negative": None,
    "non_html": None,
    "empty": None,
    "case_bank": "high",
    "case_build_id_miss": "medium",
    "case_version_miss": "low",
}


def _assert_rows_equal(vec_row: dict, orc: dict, label: str) -> None:
    assert vec_row["is_nextjs"] == orc["is_nextjs"], label
    assert vec_row["confidence"] == orc["confidence"], label
    assert list(vec_row["indicators"]) == orc["indicators"], label
    assert vec_row["build_id"] == orc["build_id"], label
    assert vec_row["version"] == orc["version"], label
    assert dict(vec_row["meta_tags"]) == orc["meta_tags"], label


def test_golden_confidence():
    for name, html in ALL.items():
        orc = oracle_detect(html)
        assert orc["confidence"] == EXPECTED_CONFIDENCE[name], name


def test_golden_extractions():
    orc = oracle_detect(ALL["high_full"])
    assert orc["build_id"] == "chunks"  # first BUILD_ID_PATTERN match wins
    assert orc["version"] == "13.4.1"
    assert orc["meta_tags"]["next-head-count"] == "3"
    assert orc["meta_tags"]["__next_root"] == "found"
    assert orc["meta_tags"]["__NEXT_DATA__"] == "found"
    assert "nextjs_meta_tags" in orc["indicators"]
    # case-sensitivity pins
    assert oracle_detect(ALL["case_build_id_miss"])["build_id"] is None
    assert oracle_detect(ALL["case_version_miss"])["version"] is None


def test_vectorized_matches_oracle_on_fixtures():
    names = list(ALL)
    frame = detect_frame(pd.Series([ALL[n] for n in names], dtype=object))
    for i, name in enumerate(names):
        _assert_rows_equal(frame.iloc[i].to_dict(), oracle_detect(ALL[name]), name)


_FRAGMENTS = [
    "__NEXT_DATA__", '"buildId"', "/_next/static/abc-123/", "/_next/data/",
    "self.__next", '<div id="__next">', "next-route-announcer", "__NEXT_P",
    "/_next/", "nextjs", "next.js", "Next.js v12.0.1", "Next.JS v9.9.9",
    '<meta name="next-head-count" content="5">', '<meta property="og:__next" content="x">',
    '<script id="__NEXT_DATA__">{}</script>', "plain text", "<p>hello</p>",
    "/_NEXT/STATIC/ABC/", "__next_data__", "", "<div>__BUILD_MANIFEST</div>",
]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=8),
    st.text(alphabet=st.characters(codec="utf-8"), max_size=40),
)
def test_vectorized_matches_oracle_property(frags, noise):
    html = noise.join(frags) if frags else noise
    frame = detect_frame(pd.Series([html], dtype=object))
    _assert_rows_equal(frame.iloc[0].to_dict(), oracle_detect(html), repr(html)[:80])


@pytest.mark.spark
def test_detect_udf_roundtrip(spark):
    rows = [(name, html) for name, html in ALL.items()]
    df = spark.createDataFrame(rows, "name string, text string")
    out = {
        r["name"]: r
        for r in df.select("name", detect_udf("text").alias("d"))
        .select("name", "d.*")
        .collect()
    }
    for name, html in ALL.items():
        orc = oracle_detect(html)
        got = out[name]
        assert got["is_nextjs"] == orc["is_nextjs"], name
        assert got["confidence"] == orc["confidence"], name
        assert got["indicators"] == orc["indicators"], name
        assert got["build_id"] == orc["build_id"], name
        assert got["version"] == orc["version"], name
        assert (got["meta_tags"] or {}) == orc["meta_tags"], name
