"""Coverage-driven coreset selection over an embedding column —
farthest-point sampling (Gonzalez 1985's 2-approximation to k-center):
pick the point farthest from everything selected so far, k times. The
standard diversity-maximizing selector for seeding clusters, picking
annotation batches, or building a small-but-spread eval set.

Scale shape: FPS is inherently k sequential passes — each pass is ONE
scan-stage job computing min-distance to the ≤ k selected centers
(broadcast as plan literals, driver state = k×dim floats) followed by a
distributed TakeOrdered(1) (per-partition top-1, no global sort). No
shuffle at all; wall-clock is k × scan. Distances reuse
``kmeans.sq_dist_to``'s declared left-to-right fold, so every
comparison is engine-exact and the DuckDB oracle replays selection
step by step; ties break to the smallest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def farthest_point_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Select ``k`` points by farthest-point sampling, starting from the
    smallest id (deterministic, no RNG). Returns (step INT, ``id_col``,
    min_dist DOUBLE — squared L2 to the nearest earlier selection; NULL
    for step 0). Already-selected ids are excluded from later steps, so
    duplicate vectors cannot be re-picked."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pivot_spark.operators.kmeans import sq_dist_to

    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    )
    first = base.orderBy("__id").limit(1).collect()
    if not first:
        return df.sparkSession.createDataFrame(
            [], f"step int, {id_col} long, min_dist double"
        )
    picked = [(0, first[0]["__id"], None)]
    centers = [list(first[0]["__v"])]
    for step in range(1, k):
        dists = [sq_dist_to(F.col("__v"), c) for c in centers]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        chosen = [p[1] for p in picked]
        nxt = (
            base.filter(~F.col("__id").isin(chosen))
            .select("__id", "__v", mind.alias("__d"))
            .orderBy(F.col("__d").desc(), F.col("__id"))
            .limit(1)
            .collect()
        )
        if not nxt:
            break  # fewer than k distinct points
        picked.append((step, nxt[0]["__id"], float(nxt[0]["__d"])))
        centers.append(list(nxt[0]["__v"]))
    schema = T.StructType(
        [
            T.StructField("step", T.IntegerType()),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("min_dist", T.DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(picked, schema)
