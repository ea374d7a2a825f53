"""streaming/stateful.py — applyInPandasWithState host sessions."""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_spark.streaming.stateful import stream_host_sessions

GAP_US = 30 * 60 * 1_000_000


def _t(h, m):
    return dt.datetime(2026, 1, 1, h, m)


def _write(path, rows, mtime):
    tbl = pa.table(
        {
            "host": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_gap_and_timeout_sessions(spark, tmp_path):
    src = tmp_path / "fetchlog"
    src.mkdir()
    now = time.time()
    # batch 0: h1 one cluster; h2 two clusters split by > gap (closes
    # in-batch); hx pushes the watermark for batch 1
    _write(
        str(src / "f1.parquet"),
        [
            ("h1", _t(10, 0)), ("h1", _t(10, 5)), ("h1", _t(10, 10)),
            ("h2", _t(10, 0)), ("h2", _t(10, 1)),
            ("h2", _t(11, 30)), ("h2", _t(11, 31)),
            ("hx", _t(13, 0)),
        ],
        now - 10,
    )
    # batch 1: watermark becomes 13:00 - 10min = 12:50, past every open
    # session's last+gap (h1 10:40, h2 12:01) -> both time out
    _write(str(src / "f2.parquet"), [("hx", _t(16, 0))], now)

    stream = (
        spark.readStream.schema("host string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream_host_sessions(stream, gap_us=GAP_US)
        .writeStream.format("memory")
        .queryName("host_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM host_sessions").collect()
    got = {
        (r["host"], r["start_us"], r["end_us"]): (r["n_events"], r["closed_by"])
        for r in rows
    }

    def us(h, m):
        return int(_t(h, m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    # h2's first cluster closed by the in-batch gap
    assert got[("h2", us(10, 0), us(10, 1))] == (2, "gap")
    # open sessions closed by the watermark timeout in batch 1
    assert got[("h1", us(10, 0), us(10, 10))] == (3, "timeout")
    assert got[("h2", us(11, 30), us(11, 31))] == (2, "timeout")
    # hx's 13:00 singleton gap-closes when its 16:00 successor arrives;
    # the 16:00 session stays open (stream ends before its timeout)
    assert got[("hx", us(13, 0), us(13, 0))] == (1, "gap")
    assert not any(s == us(16, 0) for _, s, _ in got)
    assert len(got) == 4


def test_late_event_does_not_regress_session_end(spark, tmp_path):
    # batch 0 carries h's open session to 10:20; batch 1 delivers a
    # LATE but watermark-valid event at 10:17 — the open session's end
    # must stay 10:20 (not regress to 10:17), so the 10:49 event in
    # batch 2 (gap 29min from 10:20) still merges instead of splitting
    src = tmp_path / "latelog"
    src.mkdir()
    now = time.time()
    _write(
        str(src / "a.parquet"),
        [("h", _t(10, 0)), ("h", _t(10, 20)), ("wm", _t(10, 25))],
        now - 10,
    )
    _write(str(src / "b.parquet"), [("h", _t(10, 17))], now - 5)
    _write(
        str(src / "c.parquet"),
        [("h", _t(10, 49)), ("wm", _t(23, 0))],  # wm pushes the timeout
        now - 2,
    )
    _write(str(src / "d.parquet"), [("wm", _t(23, 30))], now)

    stream = (
        spark.readStream.schema("host string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream_host_sessions(stream, gap_us=GAP_US)
        .writeStream.format("memory")
        .queryName("host_sessions3")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM host_sessions3 WHERE host = 'h'").collect()
    assert len(rows) == 1
    r = rows[0]
    # one merged session 10:00-10:49 with all 4 events
    start = dt.datetime(2026, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    end = dt.datetime(2026, 1, 1, 10, 49, tzinfo=dt.timezone.utc)
    assert r["start_us"] == int(start.timestamp() * 1_000_000)
    assert r["end_us"] == int(end.timestamp() * 1_000_000)
    assert (r["n_events"], r["closed_by"]) == (4, "timeout")


def test_cross_batch_merge_not_split(spark, tmp_path):
    # a cluster spanning two micro-batches with gaps under the threshold
    # must stay ONE session (state carried, merged, no spurious close)
    src = tmp_path / "log2"
    src.mkdir()
    now = time.time()
    _write(str(src / "a.parquet"), [("h", _t(9, 0)), ("h", _t(9, 10))], now - 10)
    _write(
        str(src / "b.parquet"),
        [("h", _t(9, 20)), ("px", _t(23, 0))],  # px pushes watermark
        now - 5,
    )
    _write(str(src / "c.parquet"), [("px", _t(23, 30))], now)

    stream = (
        spark.readStream.schema("host string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream_host_sessions(stream, gap_us=GAP_US)
        .writeStream.format("memory")
        .queryName("host_sessions2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM host_sessions2 WHERE host = 'h'"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_events"], r["closed_by"]) == (3, "timeout")
