"""SemDeDup — semantic deduplication via within-cluster cosine pruning
(public method: Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

The whole point of the method is scale: the O(n^2) pairwise cosine is
confined to k-means clusters, so the candidate-pair count is
sum(|cluster|^2) instead of n^2 — clusters are the blocking unit, the
same role LSH bands play for MinHash. The cluster self-join is a plain
equi-join on cluster id (AQE skew-join splits a runaway cluster), the
dropped-id set is tiny and broadcast back for the keep flag.

Determinism (the paper drops a random/farthest member per pair; we
declare an engine-portable rule): a row is DROPPED iff some
smaller-``id_col`` row in the same cluster has cosine similarity
>= ``eps`` with it. Keep-min-id is replayable by any engine and stable
under re-partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pivot_spark.operators.embedding import normalize_vectors
from pivot_spark.operators.kmeans import assign_clusters


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centers: Sequence[Sequence[float]],
    eps: float = 0.95,
    cluster_col: str = "cluster",
    keep_col: str = "keep",
) -> DataFrame:
    """Returns one row per input row: ``id_col``, ``cluster`` (nearest
    centroid, deterministic tie-break) and ``keep`` (False iff a
    smaller-id same-cluster row is cosine-similar >= ``eps``).

    ``centers`` typically comes from ``kmeans_fit`` — any centroid list
    works (the method's guarantees are per-cluster, not global).
    """
    assigned = assign_clusters(
        df.select(id_col, vec_col), vec_col, centers, cluster_col, dist_col=None
    ).withColumn("__nv", normalize_vectors(F.col(vec_col)))

    a = assigned.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__ida"),
        F.col("__nv").alias("__va"),
    )
    b = assigned.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__idb"),
        F.col("__nv").alias("__vb"),
    )
    dropped = (
        a.join(b, "__c")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(_dot(F.col("__va"), F.col("__vb")) >= F.lit(float(eps)))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    flag = dropped.withColumn("__dropped", F.lit(True))
    out = (
        assigned.join(F.broadcast(flag), id_col, "left")
        .withColumn(keep_col, F.col("__dropped").isNull())
        .select(id_col, cluster_col, keep_col)
    )
    return out
