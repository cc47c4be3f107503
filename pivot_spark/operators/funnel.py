"""Ordered event-sequence funnel analytics.

Classic product-analytics funnel over an event log: for an ordered list
of steps (e.g. click → view → purchase), find per user the timestamp of
the first time each step was completed *strictly after* the previous
step, plus how deep the user got and whether they converted.

Plan shape: one chained projection of ``min(when(...)) OVER (PARTITION
BY user)`` windows — step i's condition references step i-1's column,
so the chain is N sequential Window operators over the SAME partitioning
followed by a groupBy(user) that reuses the exchange: ONE shuffle total,
no self-joins, no per-user arrays. Per-row state in each window pass is
a single running min — skew-safe (a pathological user costs a wide
partition, not memory).

The reference has no event/funnel surface; north-star extension scope
(SURVEY.md §2.4 E39).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel completion for ``steps`` (ordered event types).

    Returns one row per user present in ``df``:
    ``(user_col, step1_ts..stepN_ts TIMESTAMP nullable, funnel_depth INT,
    converted BOOLEAN)``. ``step_i_ts`` is the earliest occurrence of
    ``steps[i]`` strictly after ``step_{i-1}_ts``; depth counts completed
    prefix steps; ``converted`` means all steps completed in order.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    et = F.col(type_col)
    out = df.select(user_col, ts_col, type_col)
    names = [f"step{i + 1}_ts" for i in range(len(steps))]
    for i, step in enumerate(steps):
        cond = et == step
        if i > 0:
            cond = cond & F.col(names[i - 1]).isNotNull() & (ts > F.col(names[i - 1]))
        out = out.withColumn(names[i], F.min(F.when(cond, ts)).over(w))
    agg = out.groupBy(user_col).agg(*[F.first(n).alias(n) for n in names])
    # deepest-first when() chain: first non-null step_ts wins
    depth = F.coalesce(
        *[
            F.when(F.col(names[i]).isNotNull(), F.lit(i + 1))
            for i in range(len(names) - 1, -1, -1)
        ],
        F.lit(0),
    )
    return agg.withColumn("funnel_depth", depth.cast("int")).withColumn(
        "converted", F.col(names[-1]).isNotNull()
    )
