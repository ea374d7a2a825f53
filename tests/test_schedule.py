"""operators/politeness.schedule_fetches — token bucket as a timetable."""

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import admit_per_host, schedule_fetches


def _cands(spark):
    return spark.createDataFrame(
        [
            # host, priority, surt, crawl_delay
            ("h1", 2, "h1)/a", 1.0),
            ("h1", 1, "h1)/b", 1.0),
            ("h1", 2, "h1)/c", 1.0),
            ("h2", 0, "h2)/a", None),   # NULL delay -> default 0.5
            ("h2", 0, "h2)/b", None),
            ("h3", 0, "h3)/a", 0.0),    # delay 0 -> all at round start
            ("h3", 0, "h3)/b", 0.0),
        ],
        "host string, priority int, surt string, crawl_delay double",
    )


def test_slots_follow_priority_then_surt(spark):
    got = {
        r["surt"]: (r["slot"], r["scheduled_ms"])
        for r in schedule_fetches(_cands(spark)).collect()
    }
    # h1: priority desc -> (2, h1)/a), (2, h1)/c), (1, h1)/b)
    assert got["h1)/a"] == (0, 0)
    assert got["h1)/c"] == (1, 1000)
    assert got["h1)/b"] == (2, 2000)
    # h2: NULL delay -> 500 ms default spacing
    assert got["h2)/a"] == (0, 0)
    assert got["h2)/b"] == (1, 500)
    # h3: zero delay -> everything at round start
    assert got["h3)/a"] == (0, 0)
    assert got["h3)/b"] == (0, 0) or got["h3)/b"] == (1, 0)


def test_round_start_offset(spark):
    got = {
        r["surt"]: r["scheduled_ms"]
        for r in schedule_fetches(_cands(spark), round_start_ms=10_000).collect()
    }
    assert got["h1)/a"] == 10_000
    assert got["h1)/b"] == 12_000


def test_composes_with_admission(spark):
    adm = admit_per_host(_cands(spark), budget=2, force_salting=False)
    sched = schedule_fetches(adm.admitted)
    rows = sched.where(F.col("host") == "h1").collect()
    # budget 2: only the two priority-2 URLs scheduled, slots 0 and 1
    assert sorted((r["surt"], r["slot"]) for r in rows) == [
        ("h1)/a", 0),
        ("h1)/c", 1),
    ]


def test_single_window_no_extra_shuffle(spark):
    plan = (
        schedule_fetches(_cands(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle: the host window
