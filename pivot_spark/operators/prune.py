"""Prototypicality-based data pruning (public method: Sorscher et al.
2022, "Beyond neural scaling laws" — SSL prototypes metric): embed,
cluster, then rank every example by cosine similarity to its assigned
cluster centroid. The most prototypical (easiest, most redundant)
examples prune first; keeping the hard tail beats random pruning at
large dataset sizes.

Spark shape: centroids are in-plan literals (from ``kmeans_fit`` or any
fixed prototype set), so assignment + cosine are pure scan-stage
expressions (zip_with folds, per-centroid struct argmin — no UDFs, no
join). The only shuffle is the per-cluster ranking window, keyed by
cluster id: parallelism == k, so size k to the cluster (hundreds+ at
corpus scale, where k-means cells are the natural pruning unit anyway).

Everything is deterministic fold arithmetic; an SQL oracle replays the
dot products term by term (SURVEY.md §2.4 E86).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pivot_spark.operators.kmeans import assign_clusters


def prototypicality_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centers: Sequence[Sequence[float]],
    prune_fraction: float = 0.3,
) -> DataFrame:
    """(id_col, cluster INT, proto DOUBLE rounded 4 — cosine to the
    assigned centroid, rank INT — 1 = most prototypical in its
    cluster, keep BOOLEAN — false for the first
    floor(prune_fraction * cluster_size) ranks). Ties rank toward the
    smaller id."""
    if not 0.0 <= prune_fraction <= 1.0:
        raise ValueError(f"prune_fraction must be in [0, 1], got {prune_fraction}")
    if not centers:
        raise ValueError("centers must be non-empty")
    assigned = assign_clusters(df, vec_col, centers, dist_col=None)
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centers])
    # centroid norms are plan-time constants (same 0 + t1 + t2 ... fold
    # order the SQL oracle replays)
    cnorms = F.array(
        *[F.lit(math.sqrt(sum(float(x) * float(x) for x in c))) for c in centers]
    )
    cvec = F.element_at(carr, F.col("cluster") + 1)
    v = F.col(vec_col)
    dot = F.aggregate(
        F.zip_with(v, cvec, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    vnorm = F.sqrt(
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    proto = F.try_divide(dot, vnorm * F.element_at(cnorms, F.col("cluster") + 1))
    scored = assigned.select(
        F.col(id_col), F.col("cluster"), proto.alias("__p")
    )
    w = Window.partitionBy("cluster").orderBy(F.col("__p").desc(), F.col(id_col))
    wn = Window.partitionBy("cluster")
    ranked = scored.select(
        id_col,
        "cluster",
        F.round(F.col("__p"), 4).alias("proto"),
        F.row_number().over(w).cast("int").alias("rank"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return ranked.select(
        id_col,
        "cluster",
        "proto",
        "rank",
        (F.col("rank") > F.floor(F.lit(float(prune_fraction)) * F.col("__n"))).alias(
            "keep"
        ),
    )
