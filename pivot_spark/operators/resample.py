"""Time-series resampling: bucket irregular per-key event streams onto a
regular grid and gap-fill with last-observation-carried-forward (LOCF) —
the feature-store / time-series-warehouse primitive the batch-only
reference lacks (extension surface; reference has no temporal operators,
SURVEY.md §2.3).

Scale shape: the observation aggregate shuffles once on (key, bucket);
the spine is generated scan-stage with ``F.sequence`` + ``explode`` (one
row per key covering min..max bucket — never a driver loop or a global
calendar cross-join); the LOCF fill is one window pass per key. A key's
state during the fill is one row at a time (running ``last ignorenulls``)
— power-key skew only widens a sort range, never a collect.

The observation aggregate feeds two consumers (spine bounds + the fill
join), so the raw scan runs twice; at local/bench scale re-scanning a
pruned columnar source is cheaper than materializing (measured 0.9s vs
1.4s with a checkpoint fence at sf0.1), but for an expensive source at
cluster scale persist ``obs`` before calling, or cache the input. An
all-array-domain formulation (collect per key + sequence fold) was
measured 3x slower still — O(width) array appends per key interpret
badly.

Buckets are integer epoch units (``floor(unix_ts / width)``) so the
layout replays bit-identically on any engine — no timezone/calendar
arithmetic in the hash-checked path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 86400,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto ``bucket_seconds``-wide epoch
    buckets, one row per key × bucket from the key's first to last
    observation, carrying the last observed value forward across empty
    buckets.

    Per bucket the kept observation is the latest by ``(ts, tiebreak)``
    (deterministic under concurrent timestamps when ``tiebreak_col`` is
    given). Output: ``(key, bucket BIGINT — epoch/width unit, v DOUBLE,
    filled BOOLEAN — true where no observation landed in the bucket)``.

    Rows with NULL key or ts are dropped (no spine to attach them to).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    key, ts = F.col(key_col), F.col(ts_col)
    base = df.filter(key.isNotNull() & ts.isNotNull())
    bucket = F.floor(F.unix_timestamp(ts) / F.lit(bucket_seconds))
    order = F.struct(
        *(
            [ts.alias("__ts")]
            + ([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else [])
        )
    )
    obs = (
        base.select(
            key.alias("__k"),
            bucket.alias("bucket"),
            order.alias("__o"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("__k", "bucket")
        .agg(F.max_by("__v", F.col("__o")).alias("__obs"))
    )
    spine = (
        obs.groupBy("__k")
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            "__k",
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket"),
        )
    )
    joined = spine.join(obs, ["__k", "bucket"], "left")
    w = (
        Window.partitionBy("__k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("__k").alias(key_col),
        "bucket",
        F.last("__obs", ignorenulls=True).over(w).alias("v"),
        F.col("__obs").isNull().alias("filled"),
    )
