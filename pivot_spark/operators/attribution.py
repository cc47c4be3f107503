"""Conversion attribution — credit each conversion event to the
touch/channel events that preceded it inside a lookback window
(first-touch / last-touch / linear multi-touch).

Built on the bucketized ``range_join`` (the point-in-interval strategy
documented there): conversions become per-user intervals
``[ts - lookback, ts)``, touches are points, and the join cost scales
with touches + interval replicas + true matches — never
|touches| x |conversions|. Model math after the join is plain hash
aggregation (``min_by`` / ``max_by`` arg-picks for first/last, a
count-ratio for linear) — all codegen'd, no Python, no window sort over
the fact stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400 * 1_000_000


def attribute(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    channel_col: str,
    is_conversion: Column,
    is_touch: Column,
    lookback_us: int,
    model: str = "last",
    value_col: Optional[str] = None,
    bucket_width: Optional[int] = None,
) -> DataFrame:
    """Per-(conversion, channel) credit rows.

    Output: ``user_col``, ``conv_id`` (the conversion's ``id_col``),
    ``conv_ts_us``, ``channel``, ``credit`` (sums to 1.0 per attributed
    conversion) and, when ``value_col`` is given, ``value_credit``
    (conversion value x credit). Touches strictly before the conversion
    and at most ``lookback_us`` earlier qualify; unattributed
    conversions (no touch in window) are absent.

    ``model``: ``first`` / ``last`` (deterministic arg-pick, ties broken
    by ``id_col``) or ``linear`` (equal split across qualifying
    touches).
    """
    if model not in ("first", "last", "linear"):
        raise ValueError(f"model must be first/last/linear, got {model!r}")
    from pivot_spark.operators.range_join import range_join

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = events.filter(is_conversion).select(
        F.col(user_col),
        F.col(id_col).alias("conv_id"),
        us.alias("conv_ts_us"),
        (us - F.lit(lookback_us)).alias("__start"),
        us.alias("__end"),
        *([F.col(value_col).alias("__val")] if value_col else []),
    )
    touch = events.filter(is_touch).select(
        F.col(user_col),
        us.alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(channel_col).alias("channel"),
    )
    joined = range_join(
        touch,
        conv,
        point_col="__tts",
        start_col="__start",
        end_col="__end",
        bucket_width=bucket_width or lookback_us,
        on=[user_col],
    )

    conv_keys = [user_col, "conv_id", "conv_ts_us"]
    val = [F.first(F.col("__val")).alias("__val")] if value_col else []
    if model in ("first", "last"):
        pick = F.min_by if model == "first" else F.max_by
        out = joined.groupBy(*conv_keys).agg(
            pick(F.col("channel"), F.struct(F.col("__tts"), F.col("__tid"))).alias(
                "channel"
            ),
            *val,
        ).withColumn("credit", F.lit(1.0))
    else:
        per_channel = joined.groupBy(*conv_keys, "channel").agg(
            F.count(F.lit(1)).alias("__k"), *val
        )
        # second agg over a superset key -> AQE reuses the partitioning
        totals = per_channel.groupBy(*conv_keys).agg(
            F.sum("__k").alias("__n")
        )
        out = per_channel.join(totals, conv_keys).withColumn(
            "credit", F.col("__k") / F.col("__n")
        ).drop("__k", "__n")
    if value_col:
        out = out.withColumn(
            "value_credit", F.col("__val") * F.col("credit")
        ).drop("__val")
    return out
