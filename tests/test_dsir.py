"""DSIR importance weights: target-likeness ordering, empty docs,
keep-fraction thresholding."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.dsir import dsir_logweights


@pytest.fixture(scope="module")
def corpus(spark):
    tgt = [(i, "the quick brown fox jumps over the lazy dog", True) for i in range(10)]
    near = [(100 + i, "quick brown fox and lazy dog again", False) for i in range(5)]
    far = [(200 + i, "zzz qqq www eee rrr ttt yyy uuu", False) for i in range(5)]
    empty = [(300, "", False)]
    return spark.createDataFrame(tgt + near + far + empty, ["id", "text", "is_t"])


def test_target_like_scores_higher(spark, corpus):
    out = dsir_logweights(corpus, "id", "text", F.col("is_t"))
    w = {r["id"]: r["dsir_logweight"] for r in out.collect()}
    near_avg = sum(w[100 + i] for i in range(5)) / 5
    far_avg = sum(w[200 + i] for i in range(5)) / 5
    assert near_avg > far_avg


def test_empty_doc_zero(spark, corpus):
    out = dsir_logweights(corpus, "id", "text", F.col("is_t"))
    w = {r["id"]: r["dsir_logweight"] for r in out.collect()}
    assert w[300] == 0.0


def test_keep_fraction(spark, corpus):
    out = dsir_logweights(corpus, "id", "text", F.col("is_t"), keep_fraction=0.25)
    rows = out.collect()
    kept = [r for r in rows if r["keep"]]
    # >= threshold keeps at least the top quarter; ties may add a few
    assert len(kept) >= len(rows) // 4
    # every kept weight >= every dropped weight
    if kept and len(kept) < len(rows):
        assert min(r["dsir_logweight"] for r in kept) >= max(
            r["dsir_logweight"] for r in rows if not r["keep"]
        )


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        dsir_logweights(corpus, "id", "text", F.col("is_t"), keep_fraction=1.5)
    with pytest.raises(ValueError):
        dsir_logweights(corpus, "id", "text", F.col("is_t"), num_buckets=0)
