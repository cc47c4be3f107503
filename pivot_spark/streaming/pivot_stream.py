"""Streaming pivot: the same conditional-aggregation plan over
Structured Streaming, with optional event-time windowing + watermark.

The reference is batch-only (``BatchAggregator`` plugin type,
``Pivot.java:56``); this is the engine extension that makes the operator
usable on unbounded inputs. Because the batch pivot compiles to plain
``groupBy().agg()`` of built-in aggregates, the identical expression list
(``build_agg_exprs``) runs under streaming semantics unchanged — Spark
maintains partial aggregation state per (group, window) and the sink mode
decides emission:

* no watermark → ``complete``/``update`` output modes;
* watermark + window → ``append`` emits each window once it is final,
  which restores the batch operator's exactly-once-per-group contract.

Not supported while streaming: error-port / fail routing (they need a
second pass over the input) and ``order_by``-deterministic FIRST/LAST
(arrival order is the only order a stream has).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from pivot_spark.config import OnError, PivotConfig
from pivot_spark.operators.pivot import _validate_against_schema, build_agg_exprs


def pivot_stream(
    df: DataFrame,
    config: PivotConfig,
    event_time: Optional[str] = None,
    watermark: Optional[str] = None,
    window_duration: Optional[str] = None,
    slide: Optional[str] = None,
) -> DataFrame:
    """Streaming pivot. ``df`` must be a streaming DataFrame.

    With ``event_time`` + ``window_duration``, groups become
    (window, *pivot_rows); ``watermark`` (e.g. ``"10 minutes"``) bounds
    state and enables append mode.
    """
    if not df.isStreaming:
        raise ValueError("pivot_stream requires a streaming DataFrame; use pivot()")
    if config.error_mode is not OnError.SKIP:
        raise ValueError(
            "streaming pivot supports on_error=skip-error only (error-port/"
            "fail need a second input pass)"
        )
    if config.order_by:
        raise ValueError("order_by is undefined on unbounded input")

    _validate_against_schema(config, df.schema)
    if event_time and watermark:
        df = df.withWatermark(event_time, watermark)

    keys = list(config.rows)
    if window_duration:
        if not event_time:
            raise ValueError("window_duration requires event_time")
        keys = [F.window(F.col(event_time), window_duration, slide or window_duration)] + keys

    return df.groupBy(*keys).agg(*build_agg_exprs(config, df.schema))
