"""Snapshot diff / recrawl-report operator on hand-built snapshots."""

from __future__ import annotations

from crawler_spark.operators.snapshotdiff import (
    CHANGE_SCALE,
    recrawl_report,
    snapshot_diff,
    synth_snapshots,
)


def test_diff_statuses(spark):
    prev = spark.createDataFrame(
        [("u1", "h1", "aa"), ("u2", "h1", "bb"), ("u3", "h2", "cc")],
        "url string, host string, content_md5 string",
    )
    curr = spark.createDataFrame(
        [("u1", "h1", "aa"), ("u2", "h1", "XX"), ("u4", "h2", "dd")],
        "url string, host string, content_md5 string",
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "gone", "u4": "added"}

    rep = {r["host"]: r for r in recrawl_report(snapshot_diff(prev, curr)).collect()}
    assert rep["h1"]["n_changed"] == 1 and rep["h1"]["n_unchanged"] == 1
    assert rep["h1"]["change_ppm"] == CHANGE_SCALE // 2
    # h2 has no both-rounds URLs -> rate 0, not a division error
    assert rep["h2"]["n_added"] == 1 and rep["h2"]["n_gone"] == 1
    assert rep["h2"]["change_ppm"] == 0


def test_diff_null_hashes_classified_by_presence(spark):
    # presence comes from the join keys; NULL hashes are values
    prev = spark.createDataFrame(
        [("u1", "h1", None), ("u2", "h1", None), ("u3", "h1", "aa")],
        "url string, host string, content_md5 string",
    )
    curr = spark.createDataFrame(
        [("u2", "h1", None), ("u3", "h1", None), ("u4", "h1", "bb")],
        "url string, host string, content_md5 string",
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
    assert got == {
        "u1": "gone",  # NULL prev hash is still "present in prev"
        "u2": "unchanged",  # NULL <=> NULL
        "u3": "changed",  # value -> NULL
        "u4": "added",
    }


def test_synth_snapshots_cover_all_statuses(spark):
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "text %d words here" % i) for i in range(40)],
        "doc_id long, source string, text string",
    )
    d = snapshot_diff(*synth_snapshots(docs))
    counts = {r["status"]: r["n"] for r in d.groupBy("status").count().withColumnRenamed("count", "n").collect()}
    # closed form: added = ids %10==3 (not %10==7), gone = %10==7,
    # changed = %5==0 minus the dropped ones, rest unchanged
    assert counts["added"] == sum(1 for i in range(40) if i % 10 == 3)
    assert counts["gone"] == sum(1 for i in range(40) if i % 10 == 7)
    assert counts["changed"] == sum(
        1 for i in range(40) if i % 5 == 0 and i % 10 != 3 and i % 10 != 7
    )
    assert sum(counts.values()) == 40
