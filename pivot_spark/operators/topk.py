"""Per-group top-k selection — quality-based corpus curation ("keep the
k best documents per language/source/domain bucket").

Two physical strategies, chosen by ``k`` and group shape:

* ``topk_per_group`` (window ``row_number``): one shuffle on the group
  key, per-partition sort. Spark's window sort is externally spillable,
  so a pathologically hot group (one language being 60% of a 100 TB
  corpus) degrades to disk sort, not OOM. Ties broken by the explicit
  ``tie_cols`` so results are deterministic and oracle-checkable.
* ``topk_per_group_agg`` (bounded aggregation): collects a per-group
  sorted array capped at k via partial aggregation. State per group is
  O(group size) DURING collection in the worst case, but map-side
  combine caps each task's contribution at its local rows; right when k
  is small and groups are many (per-user, per-url-host buckets) — it
  avoids the window's full per-group sort and is a single hash
  aggregate. Avoid for hot groups with huge k.

The ``select_extreme`` operator (k=1 whole-record picker) remains the
degenerate-case fast path: a plain min/max over a struct.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    rank_name: str = "rank",
) -> DataFrame:
    """Keep the top-``k`` rows of each group ordered by ``order_col``
    (desc by default), deterministic via ``tie_cols``. Adds a 1-based
    ``rank_name`` column."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        *[F.col(c).asc() for c in tie_cols],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
        .withColumn(rank_name, F.col(rank_name).cast("int"))
    )


def topk_per_group_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    rank_name: str = "rank",
) -> DataFrame:
    """Same result as ``topk_per_group`` via sorted-array aggregation:
    one hash aggregate (no per-group window sort), then explode the
    k-sliced array. Preferable for many small groups with tiny k.
    ``descending=True`` requires a numeric ``order_col`` (sort-key
    negation); use the window variant for other types."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("__p")
    key0 = -F.col(order_col) if descending else F.col(order_col)
    item = F.struct(
        key0.alias("__o"),
        *[F.col(c).alias(f"__t{i}") for i, c in enumerate(tie_cols)],
        payload,
    )
    agg = df.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("__top")
    )
    out = agg.select(F.posexplode("__top").alias("__rank", "__it"))
    return out.select(
        *[F.col(f"__it.__p.{c}").alias(c) for c in df.columns],
        (F.col("__rank") + 1).cast("int").alias(rank_name),
    )


def mode_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    out_mode: str = "mode",
    out_count: str = "mode_count",
) -> DataFrame:
    """Deterministic per-key MODE — the most frequent non-null value
    of ``value_col`` per key, ties toward the SMALLEST value:
    (keys..., ``out_mode``, ``out_count`` BIGINT).

    Two chained hash aggregates, both skew-free: (key, value) counts —
    a hot key's values spread across reducers, like the two-stage
    distinct — then per-key arg-max via a scalar min(struct(-count,
    value)). Never a window, never value buffering."""
    keys = list(key_cols)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    best = counts.groupBy(*keys).agg(
        F.min(
            F.struct((-F.col("__c")).alias("__nc"), F.col(value_col).alias("__v"))
        ).alias("__b")
    )
    return best.select(
        *keys,
        F.col("__b.__v").alias(out_mode),
        (-F.col("__b.__nc")).cast("long").alias(out_count),
    )
