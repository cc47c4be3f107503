"""Exact distributed heavy hitters via the two-pass Misra-Gries
pattern (public algorithm: Misra & Gries 1982; distributed-merge
soundness as in the MapReduce frequency-sketch literature).

Problem at 100 TB: "all values with frequency >= phi*N" via a plain
``GROUP BY value`` shuffles every distinct value — billions of group
states for a question whose answer has at most 1/phi rows.

Two passes, both with bounded state:

1. **candidates** — every partition runs Misra-Gries with k = 1/phi
   counters over its rows (an Arrow ``mapInPandas`` pass; state = k
   dict entries per partition, O(1) in the row count). Pigeonhole +
   the MG undercount bound give the superset guarantee: any value with
   global count >= N/k must exceed n_p/k somewhere and therefore
   survives at least one partition's summary. The union of partition
   candidates (<= k x partitions ids) is tiny.
2. **exact count** — one conditional aggregation counting ONLY the
   broadcast candidate set, then ``count >= ceil(phi*N)``. Group state
   is bounded by the candidate count, not the distinct-value count.

The result is EXACT (no sketch error reaches the output) — the sketch
only bounds what the second pass has to count.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivors (distinct values, <= k per
    partition)."""
    src = df.select(F.col(col).cast("string").alias("__v")).filter(
        F.col("__v").isNotNull()
    )

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf["__v"].values:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"__v": list(counters.keys())})

    return src.mapInPandas(summarize, "__v string").distinct()


def heavy_hitters(
    df: DataFrame, col: str, phi: float, out_count: str = "n"
) -> DataFrame:
    """All values of ``col`` with count >= ceil(phi * N), with their
    EXACT counts: (``col`` as string, ``out_count`` long). NULL rows
    are excluded (join/count semantics); count them separately if
    needed. 0 < phi <= 1. N = non-null row count."""
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    k = max(int(math.ceil(1.0 / phi)), 1)
    cand = _mg_candidates(df, col, k)
    src = df.select(F.col(col).cast("string").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    total = src.count()
    thresh = int(math.ceil(phi * total))
    counted = (
        src.join(F.broadcast(cand), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias(out_count))
        .filter(F.col(out_count) >= thresh)
    )
    return counted.select(F.col("__v").alias(col), out_count)
