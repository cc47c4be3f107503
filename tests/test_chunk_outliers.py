"""Document chunking (operators/chunking.py) and MAD outliers
(operators/outliers.py)."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.chunking import chunk_documents
from pivot_spark.operators.outliers import mad_outliers


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(10))
    return spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, None), (5, "solo")],
        "doc_id int, text string",
    )


def test_disjoint_chunks(docs):
    out = chunk_documents(docs, chunk_tokens=4)
    got = {(r["doc_id"], r["chunk_idx"]): (r["start_token"], r["n_tokens"], r["chunk_text"])
           for r in out.collect()}
    assert got[(1, 0)] == (0, 4, "w0 w1 w2 w3")
    assert got[(1, 1)] == (4, 4, "w4 w5 w6 w7")
    assert got[(1, 2)] == (8, 2, "w8 w9")  # short tail kept
    assert got[(2, 0)] == (0, 3, "a b c")
    assert got[(5, 0)] == (0, 1, "solo")
    # empty/null text -> no chunks
    assert all(k[0] not in (3, 4) for k in got)


def test_overlapping_chunks(docs):
    out = chunk_documents(docs.filter("doc_id = 1"), chunk_tokens=4, stride=2)
    rows = sorted(
        (r["start_token"], r["n_tokens"]) for r in out.collect()
    )
    assert rows == [(0, 4), (2, 4), (4, 4), (6, 4), (8, 2)]


def test_chunk_bad_args(docs):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=5)


def test_mad_flags_the_spike(spark):
    rows = [("g", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 100]]
    df = spark.createDataFrame(rows, "k string, x double")
    out = mad_outliers(df, "x", ["k"])
    flagged = {r["x"] for r in out.filter("is_outlier").collect()}
    assert flagged == {100.0}
    r = out.filter("x = 100.0").first()
    assert r["med"] == 11.0 and r["mad"] == 1.0


def test_mad_zero_spread_flags_nothing(spark):
    df = spark.createDataFrame([("g", 5.0)] * 6, "k string, x double")
    out = mad_outliers(df, "x", ["k"])
    assert out.filter("is_outlier").count() == 0
    assert all(r["mod_z"] is None for r in out.collect())


def test_mad_null_values(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)], "k string, x double"
    )
    out = mad_outliers(df, "x", ["k"])
    r = out.filter("x IS NULL").first()
    assert r["is_outlier"] is False and r["mod_z"] is None
