"""Spearman rank correlation: pandas parity (ties + listwise deletion),
monotone invariance, distributed-rank correctness across range splits."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.profile import _avg_rank_map, spearman_matrix


@pytest.fixture(scope="module")
def frame(spark):
    # deterministic, with heavy ties and a null row
    rows = []
    for i in range(200):
        x = float(i % 17)  # ties
        y = float((i * 7) % 23)
        z = x * 2.0 + (i % 5)  # correlated with x
        rows.append((x, y, z))
    rows.append((None, 1.0, 2.0))
    rows.append((3.0, None, 2.0))
    return spark.createDataFrame(rows, ["x", "y", "z"]).repartition(7)


def _as_map(df):
    return {(r["col_a"], r["col_b"]): r["spearman"] for r in df.collect()}


def test_matches_pandas(spark, frame):
    got = _as_map(spearman_matrix(frame, ["x", "y", "z"]))
    pdf = frame.toPandas().dropna()
    want = pdf.corr(method="spearman")
    for (a, b), v in got.items():
        assert v == pytest.approx(round(want.loc[a, b], 4), abs=1e-4), (a, b)


def test_monotone_invariance(spark):
    rows = [(float(i), math.exp(i / 10.0)) for i in range(50)]
    df = spark.createDataFrame(rows, ["x", "y"]).repartition(5)
    got = _as_map(spearman_matrix(df, ["x", "y"]))
    assert got[("x", "y")] == 1.0


def test_avg_ranks_match_sql_formula(spark, frame):
    base = frame.filter(F.col("x").isNotNull()).select(F.col("x").cast("double").alias("x"))
    rmap = {r["x"]: r["__r_x"] for r in _avg_rank_map(base, "x", num_ranges=5).collect()}
    pdf = base.toPandas()
    want = pdf["x"].rank(method="average")
    for xv, rk in zip(pdf["x"], want):
        assert rmap[xv] == pytest.approx(rk)


def test_constant_column_null(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], ["x", "y"])
    got = _as_map(spearman_matrix(df, ["x", "y"]))
    assert got[("x", "y")] is None


def test_validation(spark, frame):
    with pytest.raises(ValueError):
        spearman_matrix(frame, ["x"])
    with pytest.raises(ValueError):
        spearman_matrix(frame, ["x", "nope"])
