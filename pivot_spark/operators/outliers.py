"""Robust outlier detection: per-group modified z-score over the median
absolute deviation (Iglewicz & Hoaglin 1993, the standard robust
alternative to mean/stddev flags — one wild value cannot move the
median the way it moves a mean).

Plan shape: two tiny per-group aggregates (median, then MAD of the
residuals) joined back by broadcast — the fact table is scanned, never
shuffled by group; both aggregate states are per-group exact
percentiles (``F.percentile``) so an oracle can replay them with
``quantile_cont``. For corpus-scale groups swap ``exact=False`` to the
GK sketch (``percentile_approx``), trading replayability for bounded
state — the same knob as ``profile.quantiles``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 0.6745 = Phi^-1(3/4): scales MAD to sigma-equivalent units
_MZ = 0.6745


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    z_thresh: float = 3.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Input rows plus ``med``, ``mad``, ``mod_z`` (DOUBLE) and
    ``is_outlier`` (modified z-score ``0.6745*(x-med)/mad`` beyond
    ``z_thresh``; a zero-MAD group flags nothing). NULL values get NULL
    scores and ``is_outlier=false``."""
    group_cols = list(group_cols)
    x = F.col(value_col).cast("double")

    def _median(c):
        return (
            F.percentile(c, F.lit(0.5))
            if exact
            else F.percentile_approx(c, F.lit(0.5), F.lit(accuracy))
        )

    med = df.groupBy(*group_cols).agg(_median(x).alias("med"))
    with_med = df.join(F.broadcast(med), group_cols)
    mad = (
        with_med.groupBy(*group_cols)
        .agg(_median(F.abs(x - F.col("med"))).alias("mad"))
    )
    out = with_med.join(F.broadcast(mad), group_cols)
    mz = F.lit(_MZ) * (x - F.col("med")) / F.col("mad")
    return out.select(
        *df.columns,
        F.col("med"),
        F.col("mad"),
        F.when(F.col("mad") > 0, mz).alias("mod_z"),
        F.when(
            (F.col("mad") > 0) & x.isNotNull(),
            F.abs(mz) > F.lit(float(z_thresh)),
        )
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group robust means: (groups..., n BIGINT, mean, winsorized
    _mean — tails clamped to the [lo, hi] quantiles, trimmed_mean —
    tails dropped; DOUBLE rounded 4). The outlier-resistant summary for
    noisy measurement columns.

    Same broadcast shape as ``mad_outliers``: one tiny per-group
    quantile aggregate (exact percentile — value-buffered per group,
    the oracle-parity mode) broadcast back onto the fact rows, then one
    plain aggregate. The fact table is never shuffled by group for the
    quantile step."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got {lo}/{hi}")
    g = list(group_cols)
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(*g, x.alias("__x"))
    q = base.groupBy(*g).agg(
        F.percentile(F.col("__x"), F.lit(lo)).alias("__qlo"),
        F.percentile(F.col("__x"), F.lit(hi)).alias("__qhi"),
    )
    j = base.join(F.broadcast(q), g)
    clamped = F.least(F.greatest(F.col("__x"), F.col("__qlo")), F.col("__qhi"))
    inside = F.col("__x").between(F.col("__qlo"), F.col("__qhi"))
    return j.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("__x"), 4).alias("mean"),
        F.round(F.avg(clamped), 4).alias("winsorized_mean"),
        F.round(F.avg(F.when(inside, F.col("__x"))), 4).alias("trimmed_mean"),
    )
