"""poisson_bootstrap_mean + join_size_estimate."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.bootstrap import (
    POISSON1_CDF,
    poisson_bootstrap_mean,
    poisson_weight,
)
from pivot_spark.operators.profile import join_size_estimate


def test_poisson_weights_mean_one(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    r = df.select(
        F.avg(poisson_weight(F.col("id"), 0)).alias("m"),
        F.avg(poisson_weight(F.col("id"), 1)).alias("m2"),
    ).first()
    # Poisson(1): mean 1, var 1 -> avg over 4000 within ~5 sigma = 0.08
    assert r.m == pytest.approx(1.0, abs=0.08)
    assert r.m2 == pytest.approx(1.0, abs=0.08)
    assert r.m != r.m2  # replicas differ
    assert POISSON1_CDF[0] == pytest.approx(0.36787944117144233)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    import math

    n = 2000
    df = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(n)], "id long, x double"
    )
    out = poisson_bootstrap_mean(df, "id", "x", n_replicas=30, ci=0.9).first()
    mu = sum(i % 100 for i in range(n)) / n
    sigma = math.sqrt(sum((i % 100 - mu) ** 2 for i in range(n)) / n)
    assert out.estimate == pytest.approx(mu)
    assert out.ci_lo <= mu <= out.ci_hi
    assert out.ci_lo < out.ci_hi
    # bootstrap SE ~ sigma/sqrt(n) within a loose factor
    theo = sigma / math.sqrt(n)
    assert theo / 3 < out.se < theo * 3
    assert out.n == n and out.n_replicas == 30
    # exact determinism across runs
    again = poisson_bootstrap_mean(df, "id", "x", n_replicas=30, ci=0.9).first()
    assert again == out
    with pytest.raises(ValueError):
        poisson_bootstrap_mean(df, "id", "x", n_replicas=1)
    with pytest.raises(ValueError):
        poisson_bootstrap_mean(df, "id", "x", ci=1.0)


def test_join_size_estimate_exact(spark):
    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 9]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 3, 3, 3, 8]], "k long"
    )
    r = join_size_estimate(left, right, "k", top=2).first()
    actual = left.join(right, "k").count()
    assert r.est_rows == actual == 3 * 2 + 2 * 1 + 1 * 3
    assert r.n_keys_matched == 3
    assert r.n_keys_left == 4 and r.n_keys_right == 4
    assert r.top_contrib == 6 + 3  # keys 1 (6) and 3 (3)
    assert r.top_share == pytest.approx(9 / 11)
    with pytest.raises(ValueError):
        join_size_estimate(left, right, "k", top=0)
