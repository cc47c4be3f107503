"""Deterministic Poisson bootstrap — uncertainty estimation for massive
data (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
Streams", Google): the classical bootstrap's resample-n-of-n is
impossible distributed (it needs global coordination), but giving every
row an independent Poisson(1) weight per replica is embarrassingly
parallel and converges to the same distribution. Here the Poisson draw
is DERANDOMIZED: replica r's weight for a row comes from inverting the
Poisson(1) CDF at a 48-bit md5 uniform of (salt, r, id) — the exact
same resample on any engine, any partitioning, any day (the e18/e61
determinism contract extended to resampling).

Plan shape: ONE single-row hash aggregate carrying 2R+2 sums (per
replica: sum of weights, sum of weight*value; plus the full-sample sum
and count) — no explode, no R-fold data duplication; replica means, the
bootstrap SE and the percentile CI are scan-stage array arithmetic on
the one-row result. Each md5 digest is sliced into FOUR 32-bit
uniforms (replica r reads slice r%4 of digest group r//4), and
whole-stage codegen's subexpression elimination collapses the four
replicas' identical digest subtrees — ceil(R/4) md5 evaluations per
row, not R; state is 2R+2 doubles. (32-bit uniform granularity 2^-32
is far below every Poisson(1) CDF gap; the draw distribution is
unchanged.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P(Poisson(1) <= k) for k = 0..7; weights cap at 8 (P ~ 1e-6 of a draw
# past the table — the truncation bias is far below bootstrap noise)
POISSON1_CDF = [
    math.exp(-1.0) * sum(1.0 / math.factorial(i) for i in range(k + 1))
    for k in range(8)
]


def _poisson_weight_sql(id_sql: str, replica: int, salt: str = "boot") -> str:
    """SQL fragment for the deterministic Poisson(1) weight of row id
    ``id_sql`` in replica ``replica``: count of CDF thresholds at or
    below the row's 32-bit md5-slice uniform (inverse-CDF lookup as 8
    comparisons). Replicas 4g..4g+3 share digest md5("{salt}:{g}:{id}")
    and read hex slices 0..3 — codegen CSE computes each digest once
    per row. Emitted as a string because the Column-object form made
    ~700 py4j round-trips across 30 replicas (~2s of driver time per
    build); double literals use repr() (shortest round-trip repr, so
    the parsed double is bit-identical to F.lit)."""
    g, j = divmod(replica, 4)
    h = f"md5(concat('{salt}:{g}:', CAST({id_sql} AS STRING)))"
    u = (
        f"((CAST(conv(substring({h}, {1 + 8 * j}, 8), 16, 10) AS DOUBLE)"
        f" + 0.5) / 4294967296.0)"
    )
    return "(" + " + ".join(
        f"CAST({u} >= {c!r} AS INT)" for c in POISSON1_CDF
    ) + ")"


def poisson_weight(id_col, replica: int, salt: str = "boot"):
    """Column-object twin of ``_poisson_weight_sql`` (same tree; kept
    for composition in user code — the hot loop uses the SQL form)."""
    g, j = divmod(replica, 4)
    h = F.md5(F.concat(F.lit(f"{salt}:{g}:"), id_col.cast("string")))
    u = (
        F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = F.lit(0)
    for c in POISSON1_CDF:
        w = w + (u >= F.lit(c)).cast("int")
    return w


def poisson_bootstrap_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicas: int = 30,
    ci: float = 0.9,
    salt: str = "boot",
) -> DataFrame:
    """Bootstrap mean of ``value_col`` with standard error and
    percentile confidence interval. Output is ONE row: (estimate —
    the plain full-sample mean; boot_mean — mean of replica means;
    se — stddev of replica means, the bootstrap standard error;
    ci_lo / ci_hi — empirical percentile bounds at (1±ci)/2, indices
    floor((1-ci)/2 * R)+1 and R minus that, 1-based on the sorted
    replica means; n — row count; n_replicas)."""
    if n_replicas < 2:
        raise ValueError(f"n_replicas must be >= 2, got {n_replicas}")
    if not 0.0 < ci < 1.0:
        raise ValueError(f"ci must be in (0, 1), got {ci}")
    x = F.col(value_col).cast("double")
    idc = F.col(id_col)
    base = df.filter(x.isNotNull() & idc.isNotNull())
    # Stage the weight arithmetic through THREE explicit projections
    # (digest -> uniform -> weight) so each md5 digest and each CDF
    # inversion is computed ONCE per row. The old form inlined the
    # full conv(substring(md5 ...)) tree into every one of the 8 CDF
    # comparisons of every one of the 2R aggregate expressions (~16R
    # md5 subtrees in one Aggregate node): analysis alone cost seconds
    # of driver time and the per-row evaluation repeated the digest
    # work 16R times. CollapseProject keeps the stages separate (it
    # refuses to duplicate non-cheap expressions), so the aggregate
    # sees only plain column refs. Arithmetic is expression-identical
    # to the old inline form (same functions, same literals via repr
    # round-trip). The wide projections are selectExpr STRINGS — the
    # Column-object loop cost ~1.6 s of py4j round-trips per build.
    #
    # The md5/conv work (~R/4 digests + R BigInteger convs per row) is
    # the whole cost of this operator, and a single-file parquet scan
    # is ONE task — so spread the narrow (id, value) projection across
    # the cluster first (hash on the unique id: deterministic under
    # retry, skew-free). The shuffle moves two scalar columns per row;
    # the digest compute then parallelizes instead of grinding one
    # core (measured 32x task fan-out at sf0.1, ~4 s -> ~0.4 s).
    par = df.sparkSession.sparkContext.defaultParallelism
    narrow = base.select(idc.alias("__id"), x.alias("__x")).repartition(
        par, F.col("__id")
    )
    n_groups = (n_replicas + 3) // 4
    digests = narrow.selectExpr(
        "__x",
        *[
            f"md5(concat('{salt}:{g}:', CAST(__id AS STRING))) AS __h{g}"
            for g in range(n_groups)
        ],
    )
    u_exprs = []
    for r in range(n_replicas):
        g, j = divmod(r, 4)
        u_exprs.append(
            f"((CAST(conv(substring(__h{g}, {1 + 8 * j}, 8), 16, 10)"
            f" AS DOUBLE) + 0.5) / 4294967296.0) AS __u{r}"
        )
    uniforms = digests.selectExpr("__x", *u_exprs)
    w_exprs = [
        "("
        + " + ".join(f"CAST(__u{r} >= {c!r} AS INT)" for c in POISSON1_CDF)
        + f") AS __pw{r}"
        for r in range(n_replicas)
    ]
    weights = uniforms.selectExpr("__x", *w_exprs)
    aggs = [F.sum("__x").alias("__sx"), F.count("__x").alias("__n")]
    for r in range(n_replicas):
        pw = F.col(f"__pw{r}")
        aggs.append(F.sum(pw).alias(f"__w{r}"))
        aggs.append(F.sum(pw * F.col("__x")).alias(f"__wx{r}"))
    row = weights.agg(*aggs)
    # one projection for the replica-mean array so the downstream
    # mean/var/sort expressions reference a column instead of inlining
    # the 2R-column array constructor four times
    row = row.select(
        "__sx",
        "__n",
        F.array(
            *[
                F.try_divide(
                    F.col(f"__wx{r}"), F.col(f"__w{r}").cast("double")
                )
                for r in range(n_replicas)
            ]
        ).alias("__means"),
    )
    means = F.col("__means")
    R = float(n_replicas)
    m = F.aggregate(means, F.lit(0.0), lambda a, v: a + v) / F.lit(R)
    var = (
        F.aggregate(means, F.lit(0.0), lambda a, v: a + v * v) / F.lit(R) - m * m
    )
    lo_idx = int(math.floor((1.0 - ci) / 2.0 * n_replicas)) + 1
    hi_idx = n_replicas - lo_idx + 1
    srt = F.array_sort(means)
    return row.select(
        (F.col("__sx") / F.col("__n")).alias("estimate"),
        m.alias("boot_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("se"),
        F.element_at(srt, lo_idx).alias("ci_lo"),
        F.element_at(srt, hi_idx).alias("ci_hi"),
        F.col("__n").alias("n"),
        F.lit(n_replicas).alias("n_replicas"),
    )
