"""As-of (temporal nearest-event) join — the time-series operator Spark's
DataFrame API lacks, re-expressed as a composition of built-in operators.

``asof_join(left, right, ...)`` matches each left row with the most
recent right row at-or-before its timestamp (direction="backward", the
classic trades-to-quotes shape), or the earliest at-or-after
(direction="forward"), per join key.

Plan shape — the union/window formulation, NOT a range join:

1. project both sides to ``(keys, ts, side, left_payload, right_payload)``
   with the opposite payload null, and UNION them;
2. one window per key ordered by ``(ts, side)``:
   ``last(right_payload, ignorenulls=True)`` over rows
   unbounded-preceding..current (backward; forward mirrors with
   ``first`` over current..unbounded-following);
3. keep left rows, unpack payloads.

Why this shape at 100 TB: a naive formulation is a non-equi range join
(left.ts >= right.ts) — O(n·m) per key with no pushdown. The union
window is ONE shuffle on the join key, a sort, and a running last —
linear in rows, spillable, whole-stage-codegen'd, and the right payload
travels through the shuffle exactly once. Hot keys concentrate in one
partition (window limitation); mitigate upstream by splitting the key
range in the caller, or pre-filter right to the tolerance horizon.

Ties: a right row at exactly the left row's timestamp matches in both
directions (inclusive, matching DuckDB/pandas ``merge_asof`` with
``allow_exact_matches=True``). Multiple right rows on the same
``(key, ts)`` are reduced to one deterministic winner first (max by
``tie_col``) so results never depend on partition order.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | Sequence[str]",
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    tie_col: Optional[str] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join. Output: every left row (original columns) plus
    every non-key right column renamed ``{name}{suffix}`` (null when no
    right row qualifies).

    ``tolerance``: maximum allowed |left_ts - right_ts| (same units as
    the ts columns); matches farther away are nulled out.
    ``tie_col``: deterministic winner among right rows sharing
    ``(key, ts)`` — required if such duplicates exist (max wins).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    r_cols = [c for c in right.columns if c not in keys]
    if tie_col is not None:
        from pivot_spark.operators.select_extreme import select_extreme

        right = select_extreme(right, keys + [right_ts], tie_col, mode="max")

    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_struct = F.struct(*[F.col(c) for c in r_cols])
    l_type = T.StructType([left.schema[c] for c in left.columns])
    r_type = T.StructType([right.schema[c] for c in r_cols])

    lu = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    ru = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    u = lu.unionByName(ru)

    if direction == "backward":
        # right rows sort before left at equal ts -> inclusive match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__r", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).filter(F.col("__side") == 1)
    if tolerance is not None:
        dist = F.abs(F.col("__ts") - F.col(f"__m.{right_ts}"))
        out = out.withColumn(
            "__m", F.when(dist <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in r_cols],
    )
