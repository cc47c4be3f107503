"""Watermarked stream-stream event-time interval join — the streaming
form of the attribution/asof pattern: match each right-stream event
(e.g. a purchase) to left-stream events (e.g. clicks) from the same key
within a bounded lookback window.

Structured Streaming executes this as the built-in stream-stream join:
both sides buffer rows in watermark-bounded state and the time-range
predicate lets the engine evict state as the watermark advances — the
join condition MUST therefore carry the event-time bound, otherwise
state grows forever (Spark would reject it in append mode). State per
key is O(events inside the watermark + lookback horizon), independent
of stream length — the property that makes this runnable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` and ``right`` on ``key`` where
    ``right_ts - lookback <= left_ts < right_ts`` (strictly before, same
    convention as ``operators/attribution.py``).

    ``lookback`` / ``watermark`` are SQL interval strings ("10 minutes").
    Column names must be disjoint apart from ``key``. ``how`` may be
    ``inner`` or ``leftOuter``/``rightOuter`` (outer sides emit nulls
    only once the watermark passes — append-mode semantics).
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError("interval_join_stream requires two streaming DataFrames")
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(f"column name collision outside the key: {sorted(clash)}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (lt < rt)
        & (lt >= rt - F.expr(f"INTERVAL {lookback}"))
    )
    joined = l.join(r, cond, how)
    # project the key once (both sides carry it)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)
