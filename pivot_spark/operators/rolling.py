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
