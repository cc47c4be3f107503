"""Unit tests: column quantiles, k-per-group sampling, debounce."""

import pytest

from pivot_spark.operators.dedup import debounce
from pivot_spark.operators.profile import quantiles
from pivot_spark.operators.sample import group_hash_sample_k


# ------------------------------------------------------------- quantiles

def test_quantiles_exact_values(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = {r.prob: r.value for r in quantiles(df, ["x"], [0.0, 0.5, 1.0], exact=True).collect()}
    assert out[0.0] == 1.0 and out[1.0] == 100.0
    assert out[0.5] == 50.5  # continuous interpolation


def test_quantiles_approx_close(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10000)], "x double")
    out = {r.prob: r.value for r in quantiles(df, ["x"], [0.5]).collect()}
    assert abs(out[0.5] - 4999.5) < 50


def test_quantiles_shape_and_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    out = quantiles(df, ["a", "b"], [0.5, 0.9], exact=True)
    assert out.count() == 4
    with pytest.raises(ValueError):
        quantiles(df, ["nope"])
    with pytest.raises(ValueError):
        quantiles(df, ["a"], [1.5])


# ------------------------------------------------------ k-per-group sample

def test_group_sample_exact_k(spark):
    rows = [(i, "g" + str(i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = group_hash_sample_k(df, "id", "g", k=5)
    counts = {r.g: r.n for r in out.groupBy("g").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}


def test_group_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    out = group_hash_sample_k(df, "id", "g", k=5)
    assert out.count() == 3


def test_group_sample_deterministic(spark):
    df = spark.createDataFrame([(i, "g") for i in range(100)], "id long, g string")
    a = sorted(r.id for r in group_hash_sample_k(df, "id", "g", 10).collect())
    b = sorted(r.id for r in group_hash_sample_k(df, "id", "g", 10).collect())
    assert a == b and len(a) == 10
    # different salt -> (almost surely) different winners
    c = sorted(r.id for r in group_hash_sample_k(df, "id", "g", 10, salt="other").collect())
    assert a != c


def test_group_sample_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError):
        group_hash_sample_k(df, "id", "g", 0)


# ---------------------------------------------------------------- debounce

def _run_debounce(spark, rows, gap):
    df = spark.createDataFrame(rows, "k string, t long")
    return sorted(r.t for r in debounce(df, ["k"], "t", gap).collect())


def test_debounce_suppresses_burst(spark):
    # burst at 0,1,2, then 10, 11: kept = 0, 10 (gap 10)
    assert _run_debounce(spark, [("a", t) for t in (0, 1, 2, 10, 11)], 10) == [0, 10]


def test_debounce_vs_lag_semantics(spark):
    # 0, 6, 12: lag-filter would drop 6 and KEEP 12 (12-6=6>=10? no...)
    # with gap 10: kept = 0 (6 dropped: 6<10), 12 kept (12-0>=10).
    # A lag-based filter comparing to the previous EVENT would evaluate
    # 12-6=6 < 10 and wrongly drop 12.
    assert _run_debounce(spark, [("a", t) for t in (0, 6, 12)], 10) == [0, 12]


def test_debounce_per_key_independent(spark):
    rows = [("a", 0), ("a", 5), ("b", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "k string, t long")
    out = {(r.k, r.t) for r in debounce(df, ["k"], "t", 10).collect()}
    assert out == {("a", 0), ("b", 1)}


def test_debounce_exact_gap_kept(spark):
    assert _run_debounce(spark, [("a", 0), ("a", 10)], 10) == [0, 10]
