"""Quantile bucketing — "split each language's documents into N quality
tiers" — the standard precursor to tier-weighted sampling in corpus
curation.

Two strategies:

* ``ntile_buckets``: exact equal-count tiles via the ``ntile`` window —
  one shuffle on the group key + per-group sort (spillable). Matches
  ANSI ntile everywhere (DuckDB oracle-checkable). Right when tiers
  must be exactly balanced and per-group sort cost is acceptable.
* ``threshold_buckets``: approximate tiles via pre-computed quantile
  thresholds (``approxQuantile`` on a bounded sketch, broadcast back as
  a CASE expression). No per-row shuffle at all — the 100 TB path: one
  sketch pass + one scan-stage projection. Tier sizes are approximate
  (sketch error), boundaries are explicit and auditable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ntile_buckets(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    n: int,
    tie_cols: Sequence[str] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact equal-count quantile tiles per group (1-based; ANSI ntile
    remainder rule: earlier tiles get the extra rows). Deterministic via
    ``tie_cols``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    order = [F.col(order_col).asc(), *[F.col(c).asc() for c in tie_cols]]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(bucket_col, F.ntile(n).over(w))


def threshold_buckets(
    df: DataFrame,
    order_col: str,
    n: int,
    bucket_col: str = "bucket",
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate global quantile tiles without any shuffle: compute
    n-1 quantile thresholds with a mergeable sketch (one pass), then
    assign buckets in a scan-stage CASE. Boundary values all land in the
    lower bucket (<= threshold)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    probs = [i / n for i in range(1, n)]
    cuts = df.approxQuantile(order_col, probs, relative_error)
    expr = None
    for i, cut in enumerate(cuts, start=1):
        cond = F.col(order_col) <= F.lit(cut)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    expr = F.lit(n) if expr is None else expr.otherwise(F.lit(n))
    return df.withColumn(bucket_col, expr.cast("int"))


def zscore_normalize(
    df: DataFrame,
    keys: "Sequence[str]",
    value_col: str,
    out_col: str = "z",
) -> DataFrame:
    """Per-group z-score normalization: ``(x - mean) / stddev_pop`` with
    zero-variance groups mapping to 0 (constant features carry no
    signal; emitting 0 keeps the column dense for training).

    Plan: one tiny (group, mu, sd) aggregate joined back — the group
    cardinality is small by construction, so the join BROADCASTS and the
    fact table is never shuffled (a `Window.partitionBy` over the fact
    would shuffle and sort all of it for the same two scalars).
    """
    keys = list(keys)
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("__mu"), F.stddev_pop(value_col).alias("__sd")
    )
    joined = df.join(F.broadcast(stats), keys)
    z = F.when(
        F.col("__sd") > 0,
        F.round((F.col(value_col) - F.col("__mu")) / F.col("__sd"), 4),
    ).otherwise(F.lit(0.0))
    return joined.withColumn(out_col, z).drop("__mu", "__sd")


def robust_scale(
    df: DataFrame,
    keys: "Sequence[str]",
    value_col: str,
    tiebreak_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """Per-group robust scaling ``(x - median) / IQR`` — the outlier-
    proof sibling of ``zscore_normalize`` (one mega-value drags a mean
    and stddev arbitrarily far; the median and quartiles move by at
    most one rank), the scaling to use before outlier-sensitive
    downstream math. Zero-IQR groups map to 0 (constant-ish feature,
    no signal).

    Plan: the quartiles come from ``profile.group_quantiles`` — the
    skew-free global-rank formulation, so no group is ever sorted
    inside one task — pivoted to one row per group and joined back as
    a broadcast; the fact table is shuffled only by the ranker's range
    partitioning. Adds ``out_col`` DOUBLE next to the input columns
    (NULL-value rows keep a NULL score).
    """
    from pivot_spark.operators.profile import group_quantiles

    keys = list(keys)
    q = group_quantiles(
        df, keys, value_col, tiebreak_col, probs=(0.25, 0.5, 0.75)
    )
    stats = q.groupBy(*keys).agg(
        F.min(F.when(F.col("prob") == 0.25, F.col("value"))).alias("__q25"),
        F.min(F.when(F.col("prob") == 0.5, F.col("value"))).alias("__q50"),
        F.min(F.when(F.col("prob") == 0.75, F.col("value"))).alias("__q75"),
    )
    joined = df.join(F.broadcast(stats), keys, "left")
    iqr = F.col("__q75") - F.col("__q25")
    z = F.when(
        iqr > 0,
        (F.col(value_col).cast("double") - F.col("__q50")) / iqr,
    ).otherwise(
        F.when(F.col(value_col).isNotNull(), F.lit(0.0))
    )
    return joined.withColumn(out_col, z).drop("__q25", "__q50", "__q75")
