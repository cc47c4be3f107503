"""Event-time window aggregation — tumbling and sliding (hopping)
windows over a timestamp column, batch edition.

These are deliberately thin wrappers over ``F.window``: the point is to
use Spark's native event-time bucketing (windows aligned to the epoch,
start-inclusive / end-exclusive) rather than hand-rolled bucket math,
so the exact same expression list works under Structured Streaming with
a watermark (see ``streaming/pivot_stream.py`` for the pattern).

Plan shape: ``F.window`` is a scan-stage projection (sliding windows
explode each row into duration/slide copies — that fan-out factor is
the only cost over a plain groupBy), followed by one hash-aggregate
exchange on (window, keys). Window bounds are emitted as epoch
MICROSECONDS (BIGINT) — engine-portable and oracle-checkable, no
timezone/rendering ambiguity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: "str | None",
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    win = (
        F.window(F.col(ts_col), duration)
        if slide is None
        else F.window(F.col(ts_col), duration, slide)
    )
    out = df.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.unix_micros(F.col("__w.start")).alias("window_start_us"),
        F.unix_micros(F.col("__w.end")).alias("window_end_us"),
        *keys,
        *[c for c in out.columns if c != "__w" and c not in keys],
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Non-overlapping event-time windows of ``duration`` (e.g.
    ``"1 hour"``), epoch-aligned, [start, end). One row per
    (window, keys)."""
    return _windowed(df, ts_col, duration, None, list(keys), list(aggs))


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping (hopping) windows: a new ``duration`` window every
    ``slide``; each event lands in duration/slide windows."""
    return _windowed(df, ts_col, duration, slide, list(keys), list(aggs))
