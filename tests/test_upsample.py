"""Repeat-upsampling unit tests (operators/sample.py repeat_*)."""

import pytest

from pivot_spark.operators.sample import repeat_upsample, stratified_repeat_upsample


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)], "doc_id long, source string"
    )


def test_integer_factor_exact_copies(docs):
    out = repeat_upsample(docs, "doc_id", 2.0)
    assert out.count() == 200
    per = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per)


def test_fractional_factor_close_to_rate(spark):
    df = spark.createDataFrame([(i,) for i in range(10000)], "doc_id long")
    n = repeat_upsample(df, "doc_id", 1.5).count()
    assert abs(n - 15000) < 400


def test_factor_below_one_subsamples(spark):
    df = spark.createDataFrame([(i,) for i in range(10000)], "doc_id long")
    out = repeat_upsample(df, "doc_id", 0.25)
    n = out.count()
    assert abs(n - 2500) < 300
    # surviving rows have exactly one copy, numbered 0
    assert out.filter("copy_idx != 0").count() == 0


def test_copy_idx_numbering(docs):
    out = repeat_upsample(docs, "doc_id", 3.0)
    idx = sorted(r.copy_idx for r in out.filter("doc_id = 7").collect())
    assert idx == [0, 1, 2]


def test_deterministic(docs):
    a = sorted((r.doc_id, r.copy_idx) for r in repeat_upsample(docs, "doc_id", 1.5).collect())
    b = sorted((r.doc_id, r.copy_idx) for r in repeat_upsample(docs, "doc_id", 1.5).collect())
    assert a == b


def test_stratified_factors(docs):
    out = stratified_repeat_upsample(docs, "doc_id", "source", {"a": 2.0, "b": 0.0})
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts.get("a") == 100 and "b" not in counts


def test_stratified_default_passthrough(docs):
    out = stratified_repeat_upsample(docs, "doc_id", "source", {"a": 3.0})
    assert out.filter("source = 'b'").count() == 50  # default 1.0


def test_validation(docs):
    with pytest.raises(ValueError):
        repeat_upsample(docs, "doc_id", 0.0)
    with pytest.raises(ValueError):
        stratified_repeat_upsample(docs, "doc_id", "source", {"a": -1.0})
