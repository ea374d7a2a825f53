"""Gap-based sessionization vs a hand-computed twin."""

from __future__ import annotations

import datetime as dt

from crawler_spark.operators.sessionize import sessionize


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_sessionize_splits_on_gap(spark):
    rows = [
        # user 1: two sessions (gap 45 min between e2 and e3)
        (0, _ts(0), 1), (1, _ts(10), 1), (2, _ts(20), 1),
        (3, _ts(65), 1), (4, _ts(70), 1),
        # user 2: one long session, every gap exactly 30 min (NOT > gap)
        (5, _ts(0), 2), (6, _ts(30), 2), (7, _ts(60), 2),
        # user 3: single event
        (8, _ts(5), 3),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in sessionize(df).collect()
    }
    m_us = 60 * 1_000_000
    assert got == {
        (1, 0): (3, 20 * m_us),
        (1, 1): (2, 5 * m_us),
        (2, 0): (3, 60 * m_us),  # 30-min gaps do not split (strict >)
        (3, 0): (1, 0),
    }


def test_sessionize_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(i, _ts(i), i % 3) for i in range(30)],
        "event_id long, ts timestamp, user_id long",
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    # both windows + the rollup reuse one exchange on the session key
    assert plan.count("Exchange hashpartitioning") == 1
