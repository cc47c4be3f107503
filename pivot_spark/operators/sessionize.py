"""Sessionization: split each user's event stream into sessions separated
by inactivity gaps — the classic events-table operator (absent in the
batch-only reference; extension surface for the `events` testdata).

Batch path: lag + running-sum window — two passes over each user's
events inside ONE shuffle on the user key (both window specs share the
partitioning, Catalyst plans a single exchange + sort). At scale the
unit of work is a user's event list; skewed power-users are the risk,
mitigated by AQE and by the output being one row per event (no
per-group collect).

Streaming path: native ``F.session_window`` with a watermark — state is
one open session per key, closed and emitted when the watermark passes
the gap.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
    order_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Adds ``session_idx`` (0-based per user): a new session starts when
    the numeric ``ts_col`` advances more than ``gap`` since the previous
    event of the same user. ``order_cols`` break ordering ties
    deterministically (default: the ts column then all remaining columns
    are NOT used — pass explicit tie-breakers for exact reproducibility).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull() | (F.col(ts_col) - prev <= gap), F.lit(0)
    ).otherwise(F.lit(1))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(brk).over(wsum))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
    order_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One row per (user, session): event count, start/end, duration."""
    s = sessionize(df, user_col, ts_col, gap, order_cols)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )


def session_stats_native(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str,
) -> DataFrame:
    """Batch sessionization via the native ``F.session_window`` aggregate
    (the same expression the streaming path uses — one operator, both
    modes). ``gap`` is a duration string ("30 minutes"). One row per
    (user, session): ``(user, t_start BIGINT epoch-micros — first event,
    t_end BIGINT — last event + gap, the reported window end, n_events
    BIGINT)``.

    Scale shape vs the lag+cumsum ``sessionize``: session merging happens
    INSIDE the aggregate (partial merge of adjacent windows), one shuffle
    on the user key, no per-user sort pass, and state is one open window
    per key — the plan Structured Streaming runs unchanged. Sessions
    merge while the inter-event gap is <= the duration (an event landing
    exactly on the previous window's end still merges) and break only
    when the gap exceeds it.
    """
    return (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            # cast: parquet TIMESTAMP_NTZ bounds -> TIMESTAMP (identity
            # under the session's UTC zone) for unix_micros
            F.unix_micros(F.col("session_window.start").cast("timestamp")).alias(
                "t_start"
            ),
            F.unix_micros(F.col("session_window.end").cast("timestamp")).alias(
                "t_end"
            ),
            F.col("n_events"),
        )
    )


def sessionize_stream(
    df: DataFrame,
    user_col: str,
    event_time: str,
    gap: str,
    watermark: str,
    agg_cols: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Streaming session aggregation via native session windows.

    ``gap``/``watermark`` are duration strings ("30 minutes"). Returns
    one row per closed (user, session_window) with event count plus any
    ``agg_cols`` aggregate expressions.
    """
    if not df.isStreaming:
        raise ValueError("sessionize_stream requires a streaming DataFrame")
    aggs = [F.count(F.lit(1)).alias("n_events")] + list(agg_cols or [])
    return (
        df.withWatermark(event_time, watermark)
        .groupBy(F.session_window(F.col(event_time), gap), F.col(user_col))
        .agg(*aggs)
    )
