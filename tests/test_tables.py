"""SnapshotStore: versioned commits, rollback, kill-safety contract."""

from __future__ import annotations

import pytest

from crawler_spark.sources.tables import SnapshotStore


@pytest.mark.spark
def test_write_read_rollback(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "wh"))
    df1 = spark.range(10).withColumnRenamed("id", "x")
    df2 = spark.range(20).withColumnRenamed("id", "x")
    v1 = store.write("t", df1, meta={"round": 1})
    v2 = store.write("t", df2, meta={"round": 2})
    assert (v1, v2) == (1, 2)
    assert store.read(spark, "t").count() == 20
    assert store.meta("t")["round"] == 2
    store.rollback("t", v1)
    assert store.read(spark, "t").count() == 10
    # a new write after rollback becomes v3, current
    v3 = store.write("t", df2, meta={"round": 2, "retry": True})
    assert v3 == 3
    assert store.read(spark, "t").count() == 20
    assert store.read(spark, "t", version=1).count() == 10


@pytest.mark.spark
def test_missing_table(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "wh"))
    assert not store.exists("nope")
    with pytest.raises(FileNotFoundError):
        store.read(spark, "nope")
