"""Politeness compliance audit: gap math, violations, edge cases."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.crawlreport import (
    politeness_compliance,
    synth_crawl_delays,
)

T0 = datetime.datetime(2026, 1, 1)


def _t(s):
    return T0 + datetime.timedelta(seconds=s)


@pytest.mark.spark
def test_gap_violations_and_rate(spark):
    fetches = spark.createDataFrame(
        [
            ("h1", 1, _t(0)), ("h1", 2, _t(5)), ("h1", 3, _t(6)),  # gaps 5, 1
            ("h2", 4, _t(0)),                                       # lone fetch
            ("h3", 5, _t(0)), ("h3", 6, _t(0)),                     # dup ts: gap 0
        ],
        "host string, event_id long, ts timestamp",
    )
    delays = spark.createDataFrame(
        [("h1", 3), ("h2", 2), ("h3", 1)], "host string, crawl_delay_s long"
    )
    got = {r["host"]: r for r in politeness_compliance(fetches, delays).collect()}
    h1 = got["h1"]  # 5s gap ok vs 3s delay; 1s gap violates
    assert (h1["n_fetches"], h1["n_intervals"], h1["n_violations"]) == (3, 2, 1)
    assert h1["min_gap_us"] == 1_000_000 and h1["compliance_ppm"] == 500_000
    h2 = got["h2"]  # no interval: vacuously compliant
    assert (h2["n_intervals"], h2["n_violations"], h2["compliance_ppm"]) == (0, 0, 1_000_000)
    assert h2["min_gap_us"] is None
    h3 = got["h3"]  # duplicate timestamps: deterministic 0-gap violation
    assert (h3["n_violations"], h3["min_gap_us"]) == (1, 0)


@pytest.mark.spark
def test_synth_delays_closed_form(spark):
    f = spark.createDataFrame(
        [("h7", 1, _t(0)), ("h12", 2, _t(0)), ("h7", 3, _t(9))],
        "host string, event_id long, ts timestamp",
    )
    d = {r["host"]: r["crawl_delay_s"] for r in synth_crawl_delays(f).collect()}
    assert d == {"h7": 7 % 5 + 1, "h12": 12 % 5 + 1}
