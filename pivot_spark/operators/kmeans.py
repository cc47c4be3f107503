"""Distributed Lloyd k-means over an embedding column — the classic
iterative algorithm done Spark-first.

Per iteration the data NEVER leaves the executors:

1. **Assign** (scan stage, zero shuffle): the k current centroids are
   embedded in the plan as literal arrays; squared-L2 distance to each is
   a ``zip_with`` + ``aggregate`` fold (pure Catalyst, codegen'd), and
   the argmin is ``array_min`` over ``struct(dist, cid)`` structs —
   lexicographic struct comparison gives deterministic smallest-cid
   tie-breaking.
2. **Update** (one shuffle of k x dim scalars): new centroids via the
   ``centroids`` operator (posexplode -> per-(cluster, position) partial
   SUM/COUNT with map-side combine). Only the k x dim mean vector — a
   few KB — is collected to the driver to build the next iteration's
   literals.

At 100 TB each iteration is therefore one corpus scan plus a shuffle
whose size depends only on k x dim, not on the row count. The driver
round-trip per iteration is the standard Lloyd synchronization point
(same structure as Spark MLlib's KMeans, which also broadcasts centers
each step). k x dim literals in the plan bound practical k to a few
thousand — beyond that, switch the assign step to a broadcast-join
against a centroid table plus a groupBy argmin.

Determinism: seeded-free init = the vectors of the k smallest
``id_col`` values (explicit, engine-portable — reproducible on any
partitioning, unlike sample-based init). Empty clusters keep their
previous centroid.

The reference repo has no ML surface; this is north-star extension
scope (SURVEY.md §2.4 E54).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pivot_spark.operators.embedding import centroids as _group_centroids
from pivot_spark.operators.embedding import lit_double_array as _lit_double_array


def sq_dist_to(vec: Column, centroid: Sequence[float]) -> Column:
    """Squared L2 distance from an array<numeric> column to a constant
    centroid: left-to-right fold of (x_i - c_i)^2 — the exact
    association order is part of the declared semantics (oracles replay
    it term by term)."""
    c = _lit_double_array(centroid)
    diffs = F.zip_with(
        vec,
        c,
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centers: Sequence[Sequence[float]],
    cluster_col: str = "cluster",
    dist_col: Optional[str] = "dist_sq",
) -> DataFrame:
    """Append the argmin-centroid id (INT) and optionally the squared
    distance. Ties break to the smallest centroid id (struct min)."""
    cands = F.array(
        *[
            F.struct(
                sq_dist_to(F.col(vec_col), c).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centers)
        ]
    )
    best = F.array_min(cands)
    out = df.withColumn("__best", best).withColumn(
        cluster_col, F.col("__best.cid")
    )
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__best.d"))
    return out.drop("__best")


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    n_iter: int,
    id_col: str,
) -> list[list[float]]:
    """Run ``n_iter`` Lloyd iterations; returns the final centroid list
    (k x dim Python floats — the only data that ever reaches the
    driver). Init = vectors of the k smallest ``id_col`` values."""
    if k <= 0 or n_iter < 0:
        raise ValueError("k must be positive and n_iter non-negative")
    init_rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need >= {k} non-null vectors, got {len(init_rows)}")
    centers = [[float(x) for x in r[vec_col]] for r in init_rows]
    for _ in range(n_iter):
        assigned = assign_clusters(df, vec_col, centers, dist_col=None)
        means = _group_centroids(assigned, "cluster", vec_col).collect()
        by_cid = {r["cluster"]: [float(x) for x in r["centroid"]] for r in means}
        # empty cluster -> keep previous centroid
        centers = [by_cid.get(i, centers[i]) for i in range(k)]
    return centers


def kmeans(
    df: DataFrame,
    vec_col: str,
    k: int,
    n_iter: int,
    id_col: str,
    cluster_col: str = "cluster",
    dist_col: str = "dist_sq",
) -> DataFrame:
    """Fit + final assignment in one call: returns ``df`` with cluster
    id and squared distance to the final centroid."""
    centers = kmeans_fit(df, vec_col, k, n_iter, id_col)
    return assign_clusters(df, vec_col, centers, cluster_col, dist_col)
