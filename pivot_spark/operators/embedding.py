"""Embedding-column utilities: L2 normalization and per-group centroids.

Centroids are the workhorse of embedding-space curation — cluster
means for IVF coarse quantizers, per-label prototypes for
nearest-centroid classification, per-source drift monitoring.

Plan shape for ``centroids``: posexplode the vector -> per-(group,
position) partial SUM/COUNT with map-side combine -> re-assemble the
mean vector ordered by position. The shuffled unit is (group, position)
scalar sums — ``n_groups x dim`` rows regardless of corpus size, so the
reduction is fully distributed and the final state is tiny. This beats
driver-side averaging (collect) at any scale and beats a Pandas-UDF
GEMM for the pure-mean case because it stays entirely in codegen.

``normalize`` is a scan-stage expression (no UDF, no shuffle):
``x / sqrt(sum(x^2))`` via ``F.transform`` + ``F.aggregate``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_double_array(vec) -> Column:
    """Constant ``ARRAY<DOUBLE>`` literal built as ONE parsed SQL
    expression. The ``F.array(*[F.lit(v) ...])`` form costs one py4j
    round-trip per element (~0.3 ms each) — a 5x256 centroid set is
    ~1.3s of DRIVER time per plan build; one expr string parses
    JVM-side in ~1 ms for the identical Catalyst tree. ``repr`` emits
    the shortest round-tripping decimal, so the parsed double is
    bit-identical to ``F.lit``."""
    return F.expr(
        "CAST(array(" + ",".join(repr(float(v)) for v in vec) + ") AS ARRAY<DOUBLE>)"
    )


def l2_norm(vec: Column) -> Column:
    """sqrt(sum(x^2)) of an array<numeric> column (double)."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def normalize_vectors(vec: Column) -> Column:
    """L2-normalize an array column; all-zero vectors pass through
    unchanged (norm 0 would divide by zero).

    The norm is bound to a lambda variable (single-element array +
    transform) so it is computed ONCE per row — an expression tree
    referenced inside a higher-order-function lambda is re-evaluated
    per element, which made the inline form O(d^2) per vector."""

    def _nrm(s: Column) -> Column:
        return F.when(
            s["n"] > 0,
            F.transform(s["v"], lambda x: x.cast("double") / s["n"]),
        ).otherwise(F.transform(s["v"], lambda x: x.cast("double")))

    bound = F.array(F.struct(vec.alias("v"), l2_norm(vec).alias("n")))
    return F.element_at(F.transform(bound, _nrm), 1)


def centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    count_col: str = "n",
    centroid_col: str = "centroid",
) -> DataFrame:
    """One row per group: member count + mean vector (array<double>,
    positions averaged independently; null vectors are skipped)."""
    pos = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__pos", "__x"),
    )
    by_pos = pos.groupBy(group_col, "__pos").agg(
        F.sum(F.col("__x").cast("double")).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    # __c is identical for every position of a group (= member count)
    out = by_pos.groupBy(group_col).agg(
        F.max("__c").alias(count_col),
        F.array_sort(
            F.collect_list(F.struct(F.col("__pos"), (F.col("__s") / F.col("__c")).alias("__m")))
        ).alias("__pm"),
    )
    return out.select(
        group_col,
        count_col,
        F.transform(F.col("__pm"), lambda s: s.getField("__m")).alias(centroid_col),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str,
    q_col: str = "qvec",
    scale_col: str = "scale",
    err_col: str = "max_abs_err",
) -> DataFrame:
    """Symmetric max-abs int8 quantization of an embedding column — the
    standard 4x shrink for ANN indexes and shipped training shards.

    Per vector: ``scale = max(|x|)/127`` (DOUBLE, rounded 8); each
    component quantizes as ``floor(x/scale + 0.5)`` clamped to
    [-127, 127] (explicit round-half-up — engine-portable, unlike
    banker's rounding), stored as ``array<tinyint>``. ``max_abs_err``
    (rounded 8) audits the reconstruction: max |x - q*scale| <=
    scale/2 by construction. All-zero vectors quantize to zeros with
    scale 0.

    Pure scan-stage expressions — no UDF, no shuffle; at 100 TB this
    runs at parquet-scan throughput and cuts the shuffled/stored bytes
    of every downstream embedding op by 4x.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    maxabs = F.array_max(F.transform(x, F.abs))
    scale = (maxabs / F.lit(127.0)).alias("__scale")
    q_of = lambda s: F.transform(  # noqa: E731
        x,
        lambda v: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(v / s + F.lit(0.5)))
        ).cast("tinyint"),
    )
    zeros = F.transform(x, lambda v: F.lit(0).cast("tinyint"))
    out = df.withColumn("__scale", F.when(maxabs > 0, maxabs / 127.0).otherwise(0.0))
    s = F.col("__scale")
    q = F.when(s > 0, q_of(s)).otherwise(zeros)
    out = out.withColumn(q_col, q)
    err = F.when(
        s > 0,
        F.array_max(
            F.zip_with(
                x,
                F.col(q_col),
                lambda v, qq: F.abs(v - qq.cast("double") * s),
            )
        ),
    ).otherwise(F.array_max(F.transform(x, F.abs)))
    return (
        out.withColumn(err_col, F.round(err, 8))
        .withColumn(scale_col, F.round(s, 8))
        .drop("__scale")
    )


def random_projection(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    in_dim: int,
    seed: int = 42,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection (public lemma; dense
    Gaussian variant): project ``vec_col`` (length ``in_dim``) onto
    ``out_dim`` seeded Gaussian directions, scaled by 1/sqrt(out_dim)
    so pairwise distances are preserved in expectation. The cheap
    front-end for clustering/ANN when 64-1536-dim embeddings are too
    wide to shuffle.

    The plane matrix is generated driver-side from ``seed`` (same
    generator as the SRP-LSH planes) and folded into the plan as
    literals: the projection is a pure scan-stage zip_with/aggregate
    fold per output dimension — no shuffle, no UDF, replayable
    term-by-term by an SQL oracle."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"dims must be positive, got {out_dim}/{in_dim}")
    from pivot_spark.operators.similarity import _srp_planes

    planes = _srp_planes(out_dim, in_dim, seed)
    import math

    scale = 1.0 / math.sqrt(out_dim)
    v = F.col(vec_col)
    comps = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    lit_double_array(plane),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            * F.lit(scale)
        ).alias(f"__p{j}")
        for j, plane in enumerate(planes)
    ]
    return df.withColumn(out_col, F.array(*comps))


def class_separability(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
) -> DataFrame:
    """Per-dimension Fisher discriminant ratio of an embedding column
    against a label — the "is this embedding space any good for this
    label?" audit run before spending GPU-hours on a probe/classifier:
    dimensions with high between-class / within-class variance carry
    the signal; a flat ratio across all dims says the label is not
    linearly readable here.

    For each dimension d (ANOVA decomposition):
        between_d = (sum_c s_cd^2/n_c - N*mu_d^2) / N
        within_d  = (sum_c ssq_cd  - sum_c s_cd^2/n_c) / N
        fisher_d  = between_d / within_d          (NULL if within = 0)

    Plan: ONE corpus scan -> per-class aggregate carrying the dim-wise
    sum and sum-of-squares arrays (|classes| rows), exploded to
    |classes| x dim rows, then a dim-keyed aggregate — the corpus is
    never shuffled, only answer-sized frames are. Output: one row per
    dimension — (dim 1-based INT, n_classes, between_var, within_var,
    fisher_ratio).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    v = F.col(vec_col)
    base = df.filter(
        F.col(label_col).isNotNull() & v.isNotNull() & (F.size(v) >= dim)
    )
    per = base.groupBy(F.col(label_col).alias("__c")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.array(
            *[
                F.sum(v.getItem(i).cast("double")).alias(f"__s{i}")
                for i in range(dim)
            ]
        ).alias("__sv"),
        F.array(
            *[
                F.sum(
                    v.getItem(i).cast("double") * v.getItem(i).cast("double")
                ).alias(f"__q{i}")
                for i in range(dim)
            ]
        ).alias("__qv"),
    )
    exploded = per.select(
        "__c", "__n", F.posexplode(F.arrays_zip("__sv", "__qv"))
    ).select(
        "__c",
        "__n",
        (F.col("pos") + 1).alias("dim"),
        F.col("col.__sv").alias("__s"),
        F.col("col.__qv").alias("__q"),
    )
    g = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("__n").alias("__N"),
        F.sum("__s").alias("__ts"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__tsn"),
        F.sum("__q").alias("__tq"),
    )
    mu = F.col("__ts") / F.col("__N")
    between = (F.col("__tsn") - F.col("__N") * mu * mu) / F.col("__N")
    within = (F.col("__tq") - F.col("__tsn")) / F.col("__N")
    return g.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n_classes").cast("long").alias("n_classes"),
        between.alias("between_var"),
        within.alias("within_var"),
        F.when(within > 0, between / within).alias("fisher_ratio"),
    )


def mahalanobis_ood(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    out_col: str = "md2",
) -> DataFrame:
    """Diagonal-covariance Mahalanobis out-of-distribution score per
    vector — the standard cheap OOD screen (Lee et al. 2018, simplified
    to a diagonal Σ so it distributes as two scans):

        md2(x) = sum_d (x_d - mu_d)² / var_d

    against the corpus's own per-dimension mean/population-variance.
    High md2 rows are embedding-space outliers: encoder failures, empty
    inputs, adversarial junk — the things a quality filter should
    quarantine before training.

    Plan: ONE single-row stats aggregate (2·dim sums), broadcast back,
    then a scan-stage left-associative 64-term fold per row (the e54
    fold contract, so the float shape is engine-replayable). Zero-
    variance dimensions contribute 0 (they carry no information).
    Output: input id + ``out_col`` DOUBLE (never NULL for valid rows);
    rows with NULL/short vectors are dropped.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    v = F.col(vec_col)
    base = df.filter(
        F.col(id_col).isNotNull() & v.isNotNull() & (F.size(v) >= dim)
    )
    # SQL-string expressions + a staged (mu, var) projection on the
    # one-row stats frame: the Column-object loop cost ~2s of py4j
    # round-trips per build at dim=64, and inlining mu/var into every
    # fold term quadrupled the tree the analyzer walks. Same float
    # shapes (same divisions, same left-associative '+' chain), so the
    # scores are unchanged.
    vq = f"`{vec_col}`"
    stats = base.agg(
        F.expr("count(1)").alias("__n"),
        *[
            F.expr(f"sum(CAST({vq}[{i}] AS DOUBLE))").alias(f"__s{i}")
            for i in range(dim)
        ],
        *[
            F.expr(
                f"sum(CAST({vq}[{i}] AS DOUBLE) * CAST({vq}[{i}] AS DOUBLE))"
            ).alias(f"__q{i}")
            for i in range(dim)
        ],
    )
    mv = stats.selectExpr(
        *[f"(__s{i} / __n) AS __m{i}" for i in range(dim)],
        *[
            f"(__q{i} / __n - (__s{i} / __n) * (__s{i} / __n)) AS __v{i}"
            for i in range(dim)
        ],
    )
    j = base.crossJoin(F.broadcast(mv))
    md2 = " + ".join(
        f"(CASE WHEN __v{i} > 0 THEN ((CAST({vq}[{i}] AS DOUBLE) - __m{i})"
        f" * (CAST({vq}[{i}] AS DOUBLE) - __m{i})) / __v{i}"
        f" ELSE CAST(0.0 AS DOUBLE) END)"
        for i in range(dim)
    )
    return j.select(F.col(id_col), F.expr(md2).alias(out_col))
