"""Unit tests: embedding centroids/normalization, rolling features,
APPROXCOUNTDISTINCT pivot aggregate."""

import pytest
from pyspark.sql import functions as F

from pivot_spark import PivotConfig, pivot
from pivot_spark.operators.embedding import centroids, l2_norm, normalize_vectors
from pivot_spark.operators.rolling import rolling_features, rolling_time_features


# -------------------------------------------------------------- embeddings

def test_centroids_hand(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 6.0]),
            ("b", [5.0, 5.0]),
            ("b", None),  # null vectors skipped
        ],
        ["label", "vec"],
    )
    rows = {r.label: r for r in centroids(df, "label", "vec").collect()}
    assert rows["a"].n == 2 and rows["a"].centroid == [2.0, 4.0]
    assert rows["b"].n == 1 and rows["b"].centroid == [5.0, 5.0]


def test_normalize_vectors(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], ["v"])
    out = df.select(
        normalize_vectors(F.col("v")).alias("nv"),
        l2_norm(F.col("v")).alias("n"),
    ).collect()
    assert out[0].nv == pytest.approx([0.6, 0.8])
    assert out[0].n == pytest.approx(5.0)
    assert out[1].nv == [0.0, 0.0]  # zero vector untouched, no div-by-zero


# ----------------------------------------------------------------- rolling

def test_rolling_features_hand(spark):
    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 30.0), ("u", 4, 40.0),
         ("v", 1, 5.0)],
        ["k", "t", "x"],
    )
    out = rolling_features(df, ["k"], "t", "x", n=3)
    rows = {(r.k, r.t): r for r in out.collect()}
    assert rows[("u", 1)].roll_avg3 == pytest.approx(10.0)
    assert rows[("u", 3)].roll_avg3 == pytest.approx(20.0)
    assert rows[("u", 4)].roll_avg3 == pytest.approx(30.0)  # trailing 3 only
    assert rows[("u", 4)].roll_sum3 == pytest.approx(90.0)
    assert rows[("u", 4)].roll_cnt3 == 3
    assert rows[("v", 1)].roll_cnt3 == 1  # keys independent


def test_rolling_time_features_hand(spark):
    df = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 50, 2.0), ("u", 200, 4.0)], ["k", "ts", "x"]
    )
    out = rolling_time_features(df, ["k"], "ts", "x", horizon=100)
    rows = {r.ts: r for r in out.collect()}
    assert rows[50].trail_sum == pytest.approx(3.0)  # ts 0 within 100
    assert rows[200].trail_sum == pytest.approx(4.0)  # 50 is 150 away
    assert rows[200].trail_cnt == 1


def test_rolling_validation(spark):
    df = spark.createDataFrame([("u", 1, 1.0)], ["k", "t", "x"])
    with pytest.raises(ValueError):
        rolling_features(df, ["k"], "t", "x", n=0)
    with pytest.raises(ValueError):
        rolling_time_features(df, ["k"], "t", "x", horizon=-1)


# --------------------------------------------------- approx count distinct

def test_approxcountdistinct_close_to_exact(spark):
    rows = [(i % 7, f"g{i % 3}", f"s{i % 50}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["row", "flag", "supp"])
    cfg = lambda fn: PivotConfig(
        pivot_columns="flag=g0,g1,g2",
        pivot_rows="row",
        aggregates=f"d:{fn}(supp)",
    )
    exact = {
        r.row: (r.g0_d, r.g1_d, r.g2_d)
        for r in pivot(df, cfg("countdistinct")).output.collect()
    }
    approx = {
        r.row: (r.g0_d, r.g1_d, r.g2_d)
        for r in pivot(df, cfg("approxcountdistinct")).output.collect()
    }
    for row, ex in exact.items():
        for e, a in zip(ex, approx[row]):
            # default rsd 5% is a standard deviation, not a bound: allow 3σ
            assert abs(a - e) <= max(3, 0.15 * e)


def test_approxcountdistinct_empty_cell_identity(spark):
    df = spark.createDataFrame([(1, "g0", "x")], ["row", "flag", "supp"])
    cfg = PivotConfig(
        pivot_columns="flag=g0,g1",
        pivot_rows="row",
        aggregates="d:approxcountdistinct(supp)",
    )
    r = pivot(df, cfg).output.collect()[0]
    assert r.g0_d == 1 and r.g1_d == 0  # empty cell -> 0, not null
