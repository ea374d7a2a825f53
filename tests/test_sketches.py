"""Count-min sketch: exact twin vs a pure-Python simulation, CMS bound."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from crawler_spark.operators.sketches import (
    CMS_SEED_BASE,
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cms(keys: list[str], depth: int, width: int):
    counters: Counter = Counter()
    for k in keys:
        for j in range(depth):
            counters[(j, _h64(f"s{CMS_SEED_BASE + j}:{k}") % width)] += 1

    def est(k: str) -> int:
        return min(
            counters[(j, _h64(f"s{CMS_SEED_BASE + j}:{k}") % width)]
            for j in range(depth)
        )

    return counters, est


@pytest.mark.spark
def test_sketch_matches_python_simulation(spark):
    # Zipf-ish: key i appears ~100//(i+1) times; small width forces
    # real collisions so the over-count path is exercised, not idle
    keys = [f"k{i}" for i in range(40) for _ in range(100 // (i + 1))]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    d, w = 4, 32
    sk = {
        (r["row"], r["col"]): r["c"]
        for r in cms_build(df, depth=d, width=w).collect()
    }
    counters, est = _py_cms(keys, d, w)
    assert sk == {rc: c for rc, c in counters.items() if c}
    got = {
        r["key"]: r["est"]
        for r in cms_estimate(df, cms_build(df, depth=d, width=w), depth=d, width=w).collect()
    }
    exact = Counter(keys)
    assert set(got) == set(exact)
    for k in exact:
        assert got[k] == est(k)
        assert got[k] >= exact[k]  # one-sided CMS bound
    assert any(got[k] > exact[k] for k in exact)  # collisions planted


@pytest.mark.spark
def test_heavy_hitters_shape_and_bound(spark):
    rows = [(i, i % 7) for i in range(500)] + [(1000 + i, 3) for i in range(200)]
    events = spark.createDataFrame(rows, "event_id long, user_id long")
    hh = cms_heavy_hitters(events, k=3).collect()
    assert len(hh) == 3
    assert hh[0]["key"] == "3"  # 200 extra hits
    for r in hh:
        assert r["overcount"] >= 0
    # deterministic order: est desc, key asc
    ests = [r["est"] for r in hh]
    assert ests == sorted(ests, reverse=True)


@pytest.mark.spark
def test_sketch_is_bounded(spark):
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "key string"
    )
    n = cms_build(df, depth=4, width=64).count()
    assert n <= 4 * 64
