"""Two-pass Misra-Gries heavy hitters (operators/heavy.py)."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.heavy import heavy_hitters


def test_exact_heavy_hitters(spark):
    # 1000 rows: 'a' x 400, 'b' x 250, 'c' x 100, long tail x 250
    rows = (
        [("a",)] * 400 + [("b",)] * 250 + [("c",)] * 100
        + [(f"t{i}",) for i in range(250)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = {r["v"]: r["n"] for r in heavy_hitters(df, "v", phi=0.2).collect()}
    assert got == {"a": 400, "b": 250}  # threshold = 200; c misses


def test_matches_plain_groupby(spark):
    import random

    rng = random.Random(11)
    rows = [(str(rng.randint(0, 30) if rng.random() < 0.7 else rng.randint(0, 3000)),)
            for _ in range(5000)]
    df = spark.createDataFrame(rows, "v string").repartition(16)
    phi = 0.01
    got = {(r["v"], r["n"]) for r in heavy_hitters(df, "v", phi).collect()}
    import math
    th = math.ceil(phi * 5000)
    exact = {
        (r["v"], r["n"])
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= th).collect()
    }
    assert got == exact


def test_nulls_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), (None,), ("a",)], "v string")
    got = {r["v"] for r in heavy_hitters(df, "v", phi=0.5).collect()}
    assert got == {"a"}


def test_bad_phi(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "v", phi=0.0)
