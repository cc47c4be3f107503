"""Streaming per-window top-k heavy keys — the unbounded counterpart of
``operators.heavy.heavy_hitters``.

Custom stateful operator via ``applyInPandasWithState``, keyed by the
tumbling event-time window start: state per window is a bounded
Misra-Gries counter sketch (``capacity`` entries, O(1) in the stream
length — the same undercount-bounded summary the batch operator's pass
1 uses), folded across micro-batches. When the watermark passes the
window end, the state times out and the window's top-k (by surviving
counter, ties toward the smaller key) is emitted exactly once — append
mode, final-on-emit, like a watermarked windowed aggregate.

Counts are the MG *lower bounds* (exact when the window's distinct keys
fit ``capacity``; undercount ≤ window_rows/capacity otherwise) —
declared approximate, like every bounded-state streaming sketch.

Parallelism note: the state key is the window alone, so one task owns
one window. For high-rate streams, pre-shard — key by (window, shard),
then merge shards downstream (the MG merge adds counters and
re-prunes; the batch operator shows the exact-verify second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def topk_stream(
    df: DataFrame,
    key_col: str,
    event_time: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    k: int = 10,
    capacity: "int | None" = None,
) -> DataFrame:
    """(window_start TIMESTAMP, key STRING, est_count LONG, rank INT)
    per closed window — the k heaviest keys, emitted once the watermark
    passes the window end."""
    if not df.isStreaming:
        raise ValueError("topk_stream requires a streaming DataFrame")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cap = capacity if capacity is not None else max(8 * k, 64)
    if cap < k:
        raise ValueError(f"capacity must be >= k, got {cap} < {k}")
    # window length in ms, for the timeout timestamp (validated before
    # any plan is built)
    parts = window_duration.split()
    unit_ms = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }
    try:
        win_ms = int(parts[0]) * unit_ms[parts[1].lower()]
    except (KeyError, ValueError, IndexError):
        raise ValueError(f"unsupported window_duration {window_duration!r}")

    src = (
        df.withWatermark(event_time, watermark)
        .select(
            F.window(F.col(event_time), window_duration)["start"].alias("__ws"),
            F.col(key_col).cast("string").alias("__key"),
            # the watermarked attribute must reach the stateful operator
            # for event-time timeouts to be allowed
            F.col(event_time).alias("__et"),
        )
        .filter(F.col("__key").isNotNull())
    )

    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("key", T.StringType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        ws = key[0]

        def top_rows(counters):
            best = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            return pd.DataFrame(
                {
                    "window_start": [ws] * len(best),
                    "key": [b[0] for b in best],
                    "est_count": [b[1] for b in best],
                    "rank": list(range(1, len(best) + 1)),
                }
            )

        if state.hasTimedOut:
            keys, counts = state.get
            state.remove()
            yield top_rows(dict(zip(keys, counts)))
            return

        counters: dict = {}
        if state.exists:
            keys, counts = state.get
            counters = dict(zip(keys, counts))
        batches = [pdf for pdf in pdfs if len(pdf)]
        for pdf in batches:
            for v in pdf["__key"].values:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        # emit when the watermark passes the window end (naive
        # timestamps are UTC under spark.sql.session.timeZone=UTC —
        # pd.Timestamp.value avoids the system-local .timestamp() trap)
        ws_ms = int(pd.Timestamp(ws).value // 1_000_000)
        state.setTimeoutTimestamp(ws_ms + win_ms)
        return
        yield  # pragma: no cover — generator contract

    return src.groupBy("__ws").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
