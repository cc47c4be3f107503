"""Distributed covariance / PCA over an embedding column — the linear-
algebra rung of the embedding toolkit (dedup clustering, whitening,
dimensionality reduction before ANN indexing).

Scale shape: the only thing that ever leaves the executors is the d x d
sufficient-statistic triangle (d = embedding dim; 64 -> 2,080 scalars) —
one Arrow ``mapInPandas`` pass computes per-batch partial Gram matrices
(X^T X via BLAS) plus the column-sum vector, a single hash aggregate
merges them, and the driver finalizes covariance = (S - s s^T / n) / n.
The corpus is scanned once; nothing row-sized shuffles or collects, so
the same plan holds at 10^9 vectors. Eigen-decomposition happens on the
driver over the d x d matrix (numpy), exactly like the k-means centroid
step (``operators/kmeans.py``): driver state is dimension-bounded, not
data-bounded.

PCA projection is then a scan-stage ``F.aggregate`` dot product against
in-plan literal component vectors (same pattern as the seeded JL
projection, ``operators/embedding.py``), with deterministic sign
canonicalization (the component's largest-|coordinate| entry is made
positive) so results are engine- and library-stable.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pivot_spark.operators.embedding import lit_double_array as _lit_double_array


_STAT_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("s", T.DoubleType(), False),
    ]
)


def _partial_stats(vec_col: str, dim: int):
    iu = np.triu_indices(dim)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        S = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].values).astype("float64")
            if X.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {X.shape[1]} != declared {dim}"
                )
            S += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        # (i, j, s): upper triangle of X^T X; (i, -1): column sums;
        # (-1, -1): row count — one narrow frame, d^2-bounded
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu[0], np.arange(dim), [-1]]).astype("int32"),
                "j": np.concatenate(
                    [iu[1], np.full(dim, -1), [-1]]
                ).astype("int32"),
                "s": np.concatenate([S[iu], s, [float(n)]]),
            }
        )

    return fn


def _merged_stats(df: DataFrame, vec_col: str, dim: int) -> "tuple[np.ndarray, np.ndarray, float]":
    """(S upper-tri-complete symmetric d x d, column sums, n)."""
    base = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    merged = (
        base.mapInPandas(_partial_stats(vec_col, dim), _STAT_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    S = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0.0
    for row in merged:
        if row.i == -1:
            n = row.s
        elif row.j == -1:
            s[row.i] = row.s
        else:
            S[row.i, row.j] = row.s
            S[row.j, row.i] = row.s
    return S, s, n


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population covariance of the embedding column, as the upper
    triangle ``(i INT, j INT, cov DOUBLE rounded 4)`` with i <= j —
    d(d+1)/2 rows regardless of corpus size. NULL vectors are skipped.
    """
    spark = df.sparkSession
    S, s, n = _merged_stats(df, vec_col, dim)
    if n == 0:
        return spark.createDataFrame([], "i int, j int, cov double")
    C = (S - np.outer(s, s) / n) / n
    iu = np.triu_indices(dim)
    # `+ 0.0` folds IEEE -0.0 to +0.0 so the value hash sees one
    # canonical zero on both engines (e61/s07 convention).
    rows = [
        (int(i), int(j), float(round(C[i, j], 4)) + 0.0)
        for i, j in zip(iu[0], iu[1])
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")


def _principal_axes(df: DataFrame, vec_col: str, dim: int, k: int) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    S, s, n = _merged_stats(df, vec_col, dim)
    if n == 0:
        raise ValueError("no non-null vectors to fit PCA on")
    mu = s / n
    C = (S - np.outer(s, s) / n) / n
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, dim)
    # deterministic sign: largest-|coordinate| entry positive
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    return comps, mu, vals[order][::1]


def pca_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 2,
    out_col: str = "pc",
) -> DataFrame:
    """Project every vector onto the top-``k`` principal components
    (mean-centered): replaces nothing, adds ``out_col`` as
    ``array<double>`` of length k, values rounded 4.

    The fit is one stats pass (see module docstring); the projection is
    a second scan with the k component vectors and the mean embedded as
    plan literals — zero shuffles, zero Python in the projection path.
    """
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    comps, mu, _ = _principal_axes(df, vec_col, dim, k)
    offsets = [float(c @ mu) for c in comps]  # fold centering into the bias
    vec = F.col(vec_col)
    projections = [
        F.round(
            F.aggregate(
                F.zip_with(
                    vec,
                    _lit_double_array(comps[c]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            - F.lit(offsets[c]),
            4,
        )
        for c in range(k)
    ]
    return df.withColumn(out_col, F.array(*projections))


def explained_variance(df: DataFrame, vec_col: str, dim: int, k: int) -> "list[float]":
    """Top-k eigenvalues of the covariance (descending) — the variance
    captured per principal axis; driver-side scalars."""
    _, _, vals = _principal_axes(df, vec_col, dim, k)
    return [float(v) for v in vals]
