"""Prototypicality pruning: ranking, keep boundary, cluster isolation."""

import pytest

from pivot_spark.operators.prune import prototypicality_prune


def test_prune_most_prototypical(spark):
    # cluster 0 around (1,0); cluster 1 around (0,1). id 1 is exactly
    # the centroid -> most prototypical -> pruned at 50%.
    centers = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.4]),
        (3, [0.0, 1.0]),
        (4, [0.4, 0.9]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = {r["id"]: r for r in prototypicality_prune(df, "id", "v", centers, 0.5).collect()}
    assert out[1]["cluster"] == 0 and out[2]["cluster"] == 0
    assert out[3]["cluster"] == 1 and out[4]["cluster"] == 1
    assert out[1]["rank"] == 1 and not out[1]["keep"]
    assert out[2]["rank"] == 2 and out[2]["keep"]
    assert out[3]["rank"] == 1 and not out[3]["keep"]
    assert out[4]["keep"]
    assert out[1]["proto"] == pytest.approx(1.0)


def test_zero_fraction_keeps_all(spark):
    centers = [[1.0, 0.0]]
    df = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)], "id long, v array<double>"
    )
    out = prototypicality_prune(df, "id", "v", centers, 0.0).collect()
    assert all(r["keep"] for r in out)


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, v array<double>")
    with pytest.raises(ValueError):
        prototypicality_prune(df, "id", "v", [], 0.3)
    with pytest.raises(ValueError):
        prototypicality_prune(df, "id", "v", [[1.0]], 1.5)
