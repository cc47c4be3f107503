"""linear_regression + plan_compaction + pareto_frontier_2d."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.analytics import linear_regression
from pivot_spark.operators.layout import plan_compaction
from pivot_spark.operators.profile import pareto_frontier_2d


def test_ols_recovers_coefficients(spark):
    # y = 3 + 2*x1 - 5*x2 exactly -> R2 = 1, coefficients exact
    rows = []
    for i in range(50):
        x1, x2 = float(i % 7), float((i * 3) % 5)
        rows.append((x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = linear_regression(df, ["x1", "x2"], "y").first()
    assert r.coef[0] == pytest.approx(2.0, abs=1e-9)
    assert r.coef[1] == pytest.approx(-5.0, abs=1e-9)
    assert r.intercept == pytest.approx(3.0, abs=1e-9)
    assert r.r2 == pytest.approx(1.0, abs=1e-12)
    assert r.n == 50
    # k=3 with noise column still solves (numpy path)
    df3 = df.withColumn("x3", F.col("x1") * 0.5 + 1.0)  # collinear -> singular
    with pytest.raises(Exception):
        linear_regression(df3, ["x1", "x2", "x3"], "y").first()
    with pytest.raises(ValueError):
        linear_regression(df, [], "y")


def test_plan_compaction_bins(spark):
    rows = [("a", 900), ("b", 800), ("c", 300), ("d", 200), ("e", 100)]
    df = spark.createDataFrame(rows, "path string, size long")
    out = {r.path: r for r in plan_compaction(df, "path", "size", 1000).collect()}
    # order: a(900) b(800) c(300) d(200) e(100); cum-before: 0,900,1700,2000,2200
    assert out["a"].bin == 0
    assert out["b"].bin == 0
    assert out["c"].bin == 1
    assert out["d"].bin == 2
    assert out["e"].bin == 2
    assert out["d"].bin_bytes == 300
    # every bin except possibly the last reaches the target once started
    with pytest.raises(ValueError):
        plan_compaction(df, "path", "size", 0)


def test_pareto_frontier_small(spark):
    pts = [
        (1, 1.0, 9.0),   # frontier (max y)
        (2, 5.0, 5.0),   # frontier
        (3, 9.0, 1.0),   # frontier (max x)
        (4, 4.0, 4.0),   # dominated by 2
        (5, 5.0, 5.0),   # duplicate of 2 -> only smaller id survives
        (6, 9.0, 1.0),   # duplicate of 3
        (7, 0.5, 9.0),   # dominated by 1 (same y, smaller x)
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = sorted(r.id for r in pareto_frontier_2d(df, "x", "y", "id").collect())
    assert out == [1, 2, 3]
