"""Record-picker aggregation: per group, return the WHOLE input record
holding the max/min value of a field.

Reference surface: the ``SelectionFunction`` SPI and its
``MaxSelection`` / ``MinSelection`` implementations
(``function/SelectionFunction.java:24-30``,
``function/MaxSelection.java:24-49``, ``function/MinSelection.java:25-50``
— shipped with the pivot plugin for sibling CDAP aggregators).

Spark mapping: ``F.max_by / F.min_by`` over the full-row struct — one
hash aggregation with map-side combine (per-group state = one record),
NOT a window + row_number, which would sort every group. Ties broken by
the remaining row columns in order (struct comparison), making output
deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_extreme(
    df: DataFrame,
    group_by: Sequence[str],
    order_field: str,
    mode: str = "max",
) -> DataFrame:
    """One output row per group: the input record with the extreme
    ``order_field`` value (nulls never win; all-null groups yield the
    struct-min/max record among them like the reference's comparator
    would NPE — we instead fall back to full-struct ordering)."""
    if mode not in ("max", "min"):
        raise ValueError("mode must be 'max' or 'min'")
    group_by = list(group_by)
    others = [c for c in df.columns if c not in group_by]
    if order_field not in df.columns:
        raise ValueError(f"unknown order field {order_field!r}")
    # composite selection key: (field, *rest) — deterministic tie-break
    key = F.struct(
        F.col(order_field), *[F.col(c) for c in others if c != order_field]
    )
    rec = F.struct(*[F.col(c) for c in others])
    picker = F.max_by(rec, key) if mode == "max" else F.min_by(rec, key)
    agg = df.groupBy(*group_by).agg(picker.alias("__rec"))
    return agg.select(*group_by, *[F.col(f"__rec.{c}").alias(c) for c in others])
