"""Custom stateful streaming operator: live gap-based host sessions via
``applyInPandasWithState``.

The streaming twin of operators/sessionize.py (same gap rule, same
integer-microsecond arithmetic): per-host fetch sessions over a
continuously-arriving fetch log, where a session CLOSES either because
a later event in the same micro-batch exceeds the gap (``closed_by =
'gap'``) or because the event-time watermark passes ``last_event +
gap`` with no successor (``closed_by = 'timeout'``) — the case batch
sessionization cannot express without re-scanning, and the reason this
is a custom stateful operator rather than a windowed aggregate:
``session_window`` could group the events, but emitting the
close *reason* and keeping the open session's running state across
batches needs GroupState.

State per host is THREE integers (start_us, last_us, n_events) — no
event buffer, so state size is O(live hosts), not O(events); the
watermark-driven EventTimeTimeout expires idle hosts, which bounds
state for the 10^10-URL continuous crawl. Inside each invocation the
batch slice is vectorized (numpy diff → segment boundaries); the
Python loop runs over *segments*, not rows.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.sessionize import SESSION_GAP_US

OUT_SCHEMA = (
    "host string, start_us long, end_us long, n_events long, closed_by string"
)
STATE_SCHEMA = "start_us long, last_us long, n_events long"

_COLS = ["host", "start_us", "end_us", "n_events", "closed_by"]


def _session_func(gap_us: int):
    def f(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        host = key[0]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [[host, start_us, last_us, n, "timeout"]], columns=_COLS
            )
            return

        chunks = [pdf["_us"].to_numpy() for pdf in pdfs]
        us = np.sort(np.concatenate(chunks)) if chunks else np.array([], dtype="int64")
        if us.size == 0:
            return

        # batch slice → maximal runs with gaps <= gap_us (vectorized)
        cut = np.nonzero(np.diff(us) > gap_us)[0]
        starts = np.concatenate(([0], cut + 1))
        ends = np.concatenate((cut, [us.size - 1]))
        segs = [
            [int(us[s]), int(us[e]), int(e - s + 1)]
            for s, e in zip(starts, ends)
        ]
        if state.exists:
            segs.append(list(state.get))
        # late-but-watermark-valid events can sort BEFORE the carried
        # state segment (or inside it), so order by start and never let
        # a merge regress the running end
        segs.sort(key=lambda s: (s[0], s[1]))

        merged = [segs[0]]
        for s in segs[1:]:
            if s[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)

        open_ = merged[-1]
        state.update((open_[0], open_[1], open_[2]))
        # fires when the event-time watermark passes last + gap
        state.setTimeoutTimestamp(open_[1] // 1000 + gap_us // 1000)

        closed = merged[:-1]
        if closed:
            yield pd.DataFrame(
                [[host, s, e, n, "gap"] for s, e, n in closed], columns=_COLS
            )

    return f


def stream_host_sessions(
    fetch_log: DataFrame,
    key: str = "host",
    ts_col: str = "ts",
    gap_us: int = SESSION_GAP_US,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming (host, start_us, end_us, n_events, closed_by) over an
    unbounded fetch log (``key``, ``ts_col`` event time). Returns an
    unstarted streaming DataFrame (append mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    e = fetch_log.withWatermark(ts_col, watermark).select(
        F.col(key).alias("host"),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    return e.groupBy("host").applyInPandasWithState(
        _session_func(gap_us),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
