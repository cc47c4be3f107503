"""Streaming deduplication — the unbounded-input counterpart of
``operators.dedup``.

The reference is batch-only; these are engine extensions for the
training-data-pipeline case where documents/events arrive continuously.

Two tiers:
* ``dedup_stream`` — Spark-native ``dropDuplicates`` /
  ``dropDuplicatesWithinWatermark``: state is managed by the streaming
  aggregation operator, bounded by the watermark. The default choice.
* ``first_seen_stream`` — custom stateful operator via
  ``applyInPandasWithState``: keeps a per-key "seen" flag (plus first
  event time) in GroupState with a processing-time TTL, emitting only
  the first record of each key. This is the template for operators the
  built-ins can't express (per-key custom state transitions); state per
  key is O(1), and keys expire via timeout so state size tracks the TTL
  window, not the stream history.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Exact streaming dedup on ``keys``.

    With ``event_time`` + ``watermark``, uses
    ``dropDuplicatesWithinWatermark`` so per-key state is dropped once
    the key's event time falls behind the watermark — mandatory for
    unbounded streams (plain dropDuplicates state grows forever).
    """
    if not df.isStreaming:
        raise ValueError("dedup_stream requires a streaming DataFrame")
    if event_time and watermark:
        return df.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def first_seen_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    watermark: str = "10 minutes",
    ttl_minutes: int = 60,
) -> DataFrame:
    """Emit only the first record observed per key (custom stateful
    operator, ``applyInPandasWithState``). Output schema = input schema.

    State per key is a single flag, expired on EVENT time: a key whose
    last event is ``ttl_minutes`` behind the watermark is dropped (after
    which a recurrence is emitted again — a TTL-bounded dedup cache).
    Event-time expiry keeps state bounded by the watermark window and is
    reprocessing-safe; processing-time timeouts additionally deadlock
    ``processAllAvailable`` on this Spark line, so they are avoided.
    """
    if not df.isStreaming:
        raise ValueError("first_seen_stream requires a streaming DataFrame")
    keys = list(keys)
    df = df.withWatermark(event_time, watermark)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.LongType())])
    ttl_ms = ttl_minutes * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        # the input iterator must be fully consumed — bailing early stalls
        # the Arrow channel between the JVM and the python worker
        first = None
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if first is None:
                first = pdf.iloc[:1]
            batch_max = int(pdf[event_time].max().timestamp() * 1000)
            max_ts_ms = max(max_ts_ms, batch_max)
        already_seen = state.exists
        state.update((1,))
        if max_ts_ms:
            state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if not already_seen and first is not None:
            yield first

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def debounce_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    min_gap_seconds: int,
    watermark: str = "10 minutes",
    ttl_minutes: int = 60,
) -> DataFrame:
    """Streaming rate-limiting dedup (the unbounded counterpart of
    ``operators.dedup.debounce``): per key, emit a record iff its event
    time is >= ``min_gap_seconds`` after the last EMITTED record.

    State per key is one timestamp (ms). Within each micro-batch rows
    are sorted by event time and folded sequentially — the same
    keep-iff-gap-since-last-KEPT rule as the batch operator — and the
    fold carries across batches through GroupState. Keys expire on
    event time ``ttl_minutes`` behind the watermark (after expiry the
    next record is emitted as a fresh first). Exactly correct for
    per-key in-order arrival; records arriving out of order across
    micro-batches are judged against the state as of their batch (the
    batch operator is the reprocessing-time authority).
    """
    if not df.isStreaming:
        raise ValueError("debounce_stream requires a streaming DataFrame")
    keys = list(keys)
    df = df.withWatermark(event_time, watermark)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("last_kept_ms", T.LongType())])
    gap_ms = min_gap_seconds * 1000
    ttl_ms = ttl_minutes * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        import pandas as pd

        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values(event_time).reset_index(drop=True)
        last = state.get[0] if state.exists else None
        # the keep-iff-gap-since-last-KEPT fold is inherently sequential,
        # but loop over a pre-converted int64 array — a per-row
        # pandas ``Timestamp.timestamp()`` call dominated the fold
        ts_ms_arr = (rows[event_time].astype("int64") // 1_000_000).tolist()
        kept_idx = []
        max_ts_ms = 0
        for i, ts_ms in enumerate(ts_ms_arr):
            if ts_ms > max_ts_ms:
                max_ts_ms = ts_ms
            if last is None or ts_ms - last >= gap_ms:
                kept_idx.append(i)
                last = ts_ms
        if last is not None:
            state.update((int(last),))
        if max_ts_ms:
            state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if kept_idx:
            yield rows.iloc[kept_idx]

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
