"""Bucketized range (point-in-interval) join.

``points.p BETWEEN intervals.start AND intervals.end`` is a theta join:
Spark's only native plans are BroadcastNestedLoopJoin (O(|P|·|I|) work,
broadcast-sized intervals) or a cartesian product — both die at scale.
The standard distributed strategy (as implemented by the major SQL
engines' "range join optimization") is BUCKETIZATION:

1. pick a bucket width ~ the typical interval length;
2. each point lands in exactly ONE bucket (floor(p / width));
3. each interval replicates into every bucket it overlaps
   (floor(start/width) .. floor((end-1)/width) — end exclusive);
4. equi-join on (optional keys +) bucket — a plain shuffled hash join —
   then filter the exact predicate ``start <= p < end``.

Each qualifying (point, interval) pair meets in exactly one bucket (the
point's), so no dedup is needed. Cost scales with points + interval
replicas (interval_len / width per interval) + true matches — never the
cross product. Skewed buckets (a hot hour) fall to AQE skew-join
handling like any equi-join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (end exclusive), optionally also matching
    equi-``on`` keys. Point/start/end are integral (epoch micros, days —
    cast dates/timestamps first). Output = points.* + intervals.*
    (names must not collide except the ``on`` keys).

    ``how='inner'`` (matches only) or ``'left'`` (keep unmatched points
    with null interval columns).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column name collision outside join keys: {sorted(clash)}")

    w = F.lit(bucket_width)
    p = points.withColumn("__bkt", F.floor(F.col(point_col) / w))
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w),
                    F.floor((F.col(end_col) - 1) / w),
                )
            ),
        )
    )
    pred = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    if how == "inner":
        return p.join(iv, on + ["__bkt"]).filter(pred).drop("__bkt")
    # left: inner-match first, then add back unmatched points
    matched = p.join(iv, on + ["__bkt"]).filter(pred).drop("__bkt")
    iv_cols = [c for c in intervals.columns if c not in on]
    unmatched = p.drop("__bkt").join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    )
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.select(*points.columns, *iv_cols).unionByName(
        unmatched.select(*points.columns, *iv_cols)
    )
