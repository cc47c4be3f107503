"""dedup_clusters_keep_best: winner selection, ties, singletons."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.components import dedup_clusters_keep_best


def test_keep_best_per_cluster(spark):
    # clusters: {1,2,3} (via 1-2, 2-3), {4,5}; 6 singleton
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 7), (6, 1)], ["id", "score"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"])
    out = dedup_clusters_keep_best(df, pairs, "id", "score")
    rows = {r["id"]: (r["cluster"], r["keep"]) for r in out.collect()}
    assert rows[2] == (1, True)   # max score in {1,2,3}
    assert rows[1] == (1, False) and rows[3] == (1, False)
    assert rows[4] == (4, True)   # tie 7 == 7 -> min id wins
    assert rows[5] == (4, False)
    assert rows[6] == (6, True)   # singleton keeps itself
    assert sum(1 for c, k in rows.values() if k) == 3


def test_exactly_one_survivor(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(20)], ["id", "score"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)], ["id_a", "id_b"]
    )
    out = dedup_clusters_keep_best(df, pairs, "id", "score")
    per_cluster = (
        out.groupBy("cluster").agg(F.sum(F.col("keep").cast("int")).alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_cluster)
