"""operators/mirrors.py — host pairs serving identical payloads."""

from pyspark.sql import functions as F

from crawler_spark.operators.mirrors import mirror_candidates, mirror_report


def _caps(spark):
    rows = []
    # m.com fully mirrors 3 of big.com's 6 pages -> containment 1000
    for d in ["d1", "d2", "d3", "d4", "d5", "d6"]:
        rows.append(("big.com", d))
    for d in ["d1", "d2", "d3"]:
        rows.append(("m.com", d))
    # partial overlap below the 50% cut: 1 of other.com's 4
    for d in ["d1", "o1", "o2", "o3"]:
        rows.append(("other.com", d))
    # a digest on MANY hosts (parked template) must be pruned, not paired
    for i in range(20):
        rows.append((f"park{i}.com", "TEMPLATE"))
    # duplicate (host, digest) rows must not inflate counts
    rows.append(("m.com", "d1"))
    return spark.createDataFrame(rows, "host string, digest string")


def test_mirror_report(spark):
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_report(_caps(spark)).collect()
    }
    full = got[("big.com", "m.com")]
    assert (full["n_shared"], full["n_a"], full["n_b"]) == (3, 6, 3)
    assert full["containment_pm"] == 1000 and full["is_mirror"]
    # big/other share only d1 -> below min_shared=2, absent
    assert ("big.com", "other.com") not in got
    # no park host appears anywhere: the hot digest was capped out
    assert not any("park" in a or "park" in b for a, b in got)


def test_hot_digest_cap_bounds_fanout(spark):
    # without the cap the 20 park hosts would yield 190 pairs
    cands = mirror_candidates(_caps(spark), max_hosts=64)
    assert cands.where(F.col("host_a").startswith("park")).count() > 0
    capped = mirror_candidates(_caps(spark))  # default cap 16 < 20
    assert capped.where(F.col("host_a").startswith("park")).count() == 0


def test_threshold_tuning(spark):
    # min_pm=200 admits the 1/4-overlap pair as candidate but not mirror
    rep = mirror_report(_caps(spark), min_shared=1, min_pm=200)
    got = {(r["host_a"], r["host_b"]): r for r in rep.collect()}
    r = got[("big.com", "other.com")]
    assert r["n_shared"] == 1 and r["containment_pm"] == 250
    assert r["is_mirror"]  # 250 >= 200
