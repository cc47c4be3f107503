"""Rolling (trailing-window) features per key — the standard
feature-engineering step over an ordered event stream: "average of the
user's last N values", "count of events in the trailing hour".

Both variants are single-window plans: ONE shuffle on the key, one
per-partition sort shared by every feature column (all window specs use
the same partitioning+ordering, so Catalyst plans a single exchange +
sort). State during execution is the window frame per key — bounded by
N (row frames) or the time horizon (range frames) — and spillable.

Hot-key caveat: a key owning a large fraction of all rows serializes
into one task (window limitation); pre-split such keys upstream or
bound the horizon.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_features(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    n: int,
    tie_cols: Sequence[str] = (),
    prefix: str = "roll",
) -> DataFrame:
    """Trailing-N-rows (current inclusive) avg/sum/min/max/count of
    ``value_col`` per key, ordered by ``(order_col, *tie_cols)``. Adds
    ``{prefix}_{stat}{n}`` columns."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).asc(), *[F.col(c).asc() for c in tie_cols])
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.avg(v).over(w).alias(f"{prefix}_avg{n}"),
        F.sum(v).over(w).alias(f"{prefix}_sum{n}"),
        F.min(v).over(w).alias(f"{prefix}_min{n}"),
        F.max(v).over(w).alias(f"{prefix}_max{n}"),
        F.count(v).over(w).alias(f"{prefix}_cnt{n}"),
    )


def rolling_time_features(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    prefix: str = "trail",
) -> DataFrame:
    """Trailing time-horizon (current inclusive) avg/sum/count per key:
    all rows whose numeric ``ts_col`` lies within ``horizon`` units
    before the current row's. Range frame — rows with equal ts share the
    same result (no tie-break needed, unlike row frames)."""
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-horizon, Window.currentRow)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.avg(v).over(w).alias(f"{prefix}_avg"),
        F.sum(v).over(w).alias(f"{prefix}_sum"),
        F.count(v).over(w).alias(f"{prefix}_cnt"),
    )


def decayed_aggregates(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    ref_ts: str,
    half_life_days: float = 7.0,
) -> DataFrame:
    """Exponential time-decay aggregates per key — the recency-weighted
    engagement features every ranking/feature pipeline keeps:

        w(t) = 0.5 ^ (days_between(ref_ts, t) / half_life_days)

    Returns (keys..., n BIGINT — raw row count, decayed_n DOUBLE,
    decayed_sum DOUBLE — Σw·value, both rounded 4, last_ts TIMESTAMP).
    ``ref_ts`` is an explicit literal (e.g. "2024-01-01 00:00:00") so
    results are deterministic and engine-replayable — never "now()".

    Scale shape: the weight is a scan-stage expression; the whole
    operator is ONE partial/final hash aggregate on the keys (decayed
    sums are plain sums of weighted terms — mergeable, no window, no
    sort). Refreshing tomorrow = multiply yesterday's sums by the
    day-boundary decay factor and add the delta's sums — the same
    mergeable-state algebra as ``incremental_agg``."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be positive, got {half_life_days}")
    keys = list(key_cols)
    t = F.col(ts_col)
    # unix_micros(cast(... as timestamp)) handles TIMESTAMP and
    # TIMESTAMP_NTZ alike (session tz pinned UTC — the repo-wide
    # event-time idiom); /1e6 = fractional epoch seconds, matching
    # DuckDB epoch_us(ts)/1000000.0 bit for bit
    t_sec = F.unix_micros(t.cast("timestamp")) / F.lit(1_000_000.0)
    ref_sec = F.unix_micros(F.lit(ref_ts).cast("timestamp")) / F.lit(1_000_000.0)
    age_days = (ref_sec - t_sec) / F.lit(86400.0)
    w = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days)))
    return (
        df.filter(t.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(w), 4).alias("decayed_n"),
            F.round(F.sum(w * F.col(value_col)), 4).alias("decayed_sum"),
            F.max(t).alias("last_ts"),
        )
    )


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    order_cols: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponential moving average in event order — the classic
    sequential smoother (EWMA_1 = x_1; EWMA_i = α·x_i + (1-α)·EWMA_i-1).
    Emits one row per input observation: (keys..., seq INT — 1-based
    position in the key's ordered stream, value DOUBLE, ewma DOUBLE).

    The recurrence is inherently sequential per key, so — like
    ``dedup.debounce`` — it is computed as an ordered ``F.aggregate``
    fold over the key's collected event array (a window ``lag`` cannot
    express a recurrence on its own output, and the closed-form
    (1-α)^-i rescaling overflows for long streams). State is one key's
    events; power-key skew is the documented bound, exactly as for any
    per-key sequence operator (``user_journeys``, ``debounce``).
    ``order_cols`` break timestamp ties deterministically.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = list(key_cols)
    t = F.col(ts_col)
    base = df.filter(t.isNotNull() & F.col(value_col).isNotNull())
    ev = F.struct(
        t.alias("__t"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("__v"),
    )
    # one collect per key; the sort, value projection and fold are
    # scan-stage array expressions AFTER the aggregate
    agg = base.groupBy(*keys).agg(F.collect_list(ev).alias("__arr"))
    vals = F.transform(F.array_sort(F.col("__arr")), lambda s: s["__v"])
    folded = F.aggregate(
        F.col("__vs"),
        F.array().cast("array<double>"),
        lambda acc, x: F.array_append(
            acc,
            F.when(F.size(acc) == 0, x).otherwise(
                F.lit(alpha) * x + F.lit(1.0 - alpha) * F.element_at(acc, -1)
            ),
        ),
    )
    agg = agg.select(*keys, vals.alias("__vs")).select(
        *keys, F.col("__vs"), folded.alias("__sm")
    )
    pos = F.posexplode(F.arrays_zip(F.col("__vs").alias("v"), F.col("__sm").alias("s")))
    return agg.select(*keys, pos.alias("__i", "__z")).select(
        *keys,
        (F.col("__i") + 1).cast("int").alias("seq"),
        F.col("__z.v").alias("value"),
        F.col("__z.s").alias(out_col),
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 4.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-sided CUSUM change-point detection per key (Page 1954): the
    classic sequential mean-shift alarm. Values are standardized against
    the key's own mean/stddev, then the one-sided statistics

        s+_i = max(0, s+_{i-1} + z_i - k)
        s-_i = max(0, s-_{i-1} - z_i - k)

    accumulate drift above/below the mean; ``alarm`` fires while either
    exceeds ``h``. ``k`` is the slack (in sigmas) and ``h`` the decision
    threshold.

    Like ``ewma`` the recurrence is inherently sequential per key, so it
    runs as an ordered ``F.aggregate`` fold over the key's collected
    event array — ONE shuffle (the groupBy), with the per-key mean/std
    computed from the same array (pure scan-stage expressions, no second
    aggregate). Zero-variance keys emit z = 0 everywhere. State is one
    key's events; power-key skew is the documented bound shared by every
    per-key sequence operator here. Output: (keys..., seq, value,
    s_pos, s_neg, alarm)."""
    if not k >= 0.0:
        raise ValueError(f"k must be >= 0, got {k}")
    keys = list(key_cols)
    t = F.col(ts_col)
    base = df.filter(t.isNotNull() & F.col(value_col).isNotNull())
    ev = F.struct(
        t.alias("__t"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("__v"),
    )
    agg = base.groupBy(*keys).agg(F.collect_list(ev).alias("__arr"))
    vals = F.transform(F.array_sort(F.col("__arr")), lambda s: s["__v"])
    agg = agg.select(*keys, vals.alias("__vs"))
    n = F.size(F.col("__vs")).cast("double")
    mu = F.aggregate(F.col("__vs"), F.lit(0.0), lambda a, x: a + x) / n
    var = (
        F.aggregate(F.col("__vs"), F.lit(0.0), lambda a, x: a + x * x) / n
        - mu * mu
    )
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    agg = agg.select(*keys, "__vs", mu.alias("__mu"), sd.alias("__sd"))
    z = F.transform(
        F.col("__vs"),
        lambda x: F.when(
            F.col("__sd") > 0, (x - F.col("__mu")) / F.col("__sd")
        ).otherwise(F.lit(0.0)),
    )
    # fold carries array<struct<p,m>> of the running (s+, s-) pair
    folded = F.aggregate(
        F.col("__zs"),
        F.array().cast("array<struct<p:double,m:double>>"),
        lambda acc, zz: F.array_append(
            acc,
            F.struct(
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(F.try_element_at(acc, F.lit(-1))["p"], F.lit(0.0))
                    + zz
                    - F.lit(k),
                ).alias("p"),
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(F.try_element_at(acc, F.lit(-1))["m"], F.lit(0.0))
                    - zz
                    - F.lit(k),
                ).alias("m"),
            ),
        ),
    )
    agg = agg.select(*keys, "__vs", z.alias("__zs")).select(
        *keys, "__vs", folded.alias("__ss")
    )
    pos = F.posexplode(
        F.arrays_zip(F.col("__vs").alias("v"), F.col("__ss").alias("s"))
    )
    return agg.select(*keys, pos.alias("__i", "__z")).select(
        *keys,
        (F.col("__i") + 1).cast("int").alias("seq"),
        F.col("__z.v").alias("value"),
        F.col("__z.s.p").alias("s_pos"),
        F.col("__z.s.m").alias("s_neg"),
        ((F.col("__z.s.p") > h) | (F.col("__z.s.m") > h)).alias("alarm"),
    )
