"""RRF fusion: score formula, absent-from-one-list handling, ordering."""

import pytest

from pivot_spark.operators.fusion import rrf_fuse


def test_rrf_scores_and_order(spark):
    a = spark.createDataFrame([(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([(1, 11, 1), (1, 12, 2), (1, 13, 3)], ["query_id", "doc_id", "rank"])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], rrf_k=60).collect()}
    # doc 11: 1/62 + 1/61; doc 10: 1/61 only
    assert out[11]["rrf_score"] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[10]["rrf_score"] == pytest.approx(round(1 / 61, 6))
    assert out[11]["n_lists"] == 2 and out[10]["n_lists"] == 1
    assert out[11]["rank"] == 1  # in both lists -> wins
    # doc 10 (rank1 in a) vs doc 12 (rank3+rank2): 1/61 < 1/63+1/62
    assert out[12]["rank"] == 2 and out[10]["rank"] == 3


def test_top_k_and_multi_query(spark):
    a = spark.createDataFrame(
        [(q, d, r) for q in (1, 2) for r, d in enumerate([5, 6, 7], 1)],
        ["query_id", "doc_id", "rank"],
    )
    out = rrf_fuse([a], top_k=2).collect()
    assert len(out) == 4
    assert all(r["rank"] <= 2 for r in out)


def test_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
