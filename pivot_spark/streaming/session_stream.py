"""Streaming sessionization — the unbounded counterpart of
``operators.sessionize`` (30-min-gap sessions, e14).

Custom stateful operator via ``applyInPandasWithState``: per user, fold
events into the open session; when an event arrives more than ``gap``
after the previous one, the open session closes and is emitted, and the
event starts a new one. Sessions with no successor event close via
EVENT-TIME timeout once the watermark passes ``last_ts + gap`` — so
every session is eventually emitted exactly once, and state per key is
O(1) (start, last, count, value sum), bounded by the watermark window.

This is the template the built-in ``session_window`` aggregation can't
cover once per-session state is custom (running aggregates beyond
count/sum, early-emit policies, session caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_stream(
    df: DataFrame,
    user_col: str = "user_id",
    event_time: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed sessions per user: ``(user, session_start, session_end,
    n_events, sum_value)``. A session closes when a later event exceeds
    the gap, or when the watermark passes its end + gap (timeout)."""
    if not df.isStreaming:
        raise ValueError("session_stream requires a streaming DataFrame")
    df = df.withWatermark(event_time, watermark)
    gap_ms = gap_minutes * 60 * 1000

    out_schema = T.StructType(
        [
            df.schema[user_col],
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("sv", T.DoubleType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(start_ms, last_ms, n, sv):
            return pd.DataFrame(
                {
                    user_col: [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )

        if state.hasTimedOut:
            start_ms, last_ms, n, sv = state.get
            state.remove()
            yield emit(start_ms, last_ms, n, sv)
            return

        # consume ALL batches first (bailing early stalls the Arrow
        # channel), then fold in event-time order
        parts = [pdf for pdf in pdfs if len(pdf)]
        events = pd.concat(parts).sort_values(event_time)
        ts_ms = (events[event_time].astype("int64") // 1_000_000).to_numpy()
        vals = events[value_col].astype("float64").to_numpy()

        if state.exists:
            start_ms, last_ms, n, sv = state.get
        else:
            start_ms = last_ms = int(ts_ms[0])
            n, sv = 0, 0.0

        closed = []
        for t, v in zip(ts_ms, vals):
            t = int(t)
            if n > 0 and t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n, sv))
                start_ms, n, sv = t, 0, 0.0
            last_ms = t
            n += 1
            sv += float(v)
        state.update((start_ms, last_ms, n, sv))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        for c in closed:
            yield emit(*c)

    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
