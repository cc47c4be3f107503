"""Unit tests for the curation operators: deterministic sampling,
TF-IDF, per-group top-k, cross-corpus decontamination."""

import math

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.sample import (
    _threshold,
    hash_sample,
    stratified_hash_sample,
)
from pivot_spark.operators.tfidf import tfidf_top_terms
from pivot_spark.operators.topk import topk_per_group, topk_per_group_agg
from pivot_spark.operators.dedup import dedup_against


# ---------------------------------------------------------------- sampling

def test_threshold_bounds():
    assert _threshold(0.0) == "0000"
    assert _threshold(1.0) == "g"  # sorts above every hex digit
    assert _threshold(0.25) == "4000"
    with pytest.raises(ValueError):
        _threshold(1.5)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = set(r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect())
    s1b = set(r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect())
    s2 = set(r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect())
    assert s1 == s1b  # reproducible
    assert s1 <= s2  # thresholds nest: rate-0.1 keep-set subset of rate-0.2
    assert abs(len(s2) / 2000 - 0.2) < 0.05  # roughly the declared rate
    # repartitioning must not change the kept set
    s1c = set(
        r.doc_id for r in hash_sample(df.repartition(7), "doc_id", 0.1).collect()
    )
    assert s1 == s1c


def test_hash_sample_rate_edges(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, "doc_id", 0.0).count() == 0
    assert hash_sample(df, "doc_id", 1.0).count() == 100


def test_stratified_hash_sample(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    got = out.groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in got}
    assert counts.get("en") == 500  # rate 1.0 keeps every en row
    assert "de" not in counts  # rate 0.0 drops all de rows
    # default_rate applies to unlisted strata
    df2 = df.withColumn("lang", F.lit("fr"))
    n = stratified_hash_sample(
        df2, "doc_id", "lang", {"en": 1.0}, default_rate=0.5
    ).count()
    assert abs(n / 1000 - 0.5) < 0.1


# ------------------------------------------------------------------ tf-idf

def test_tfidf_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, "doc_id", "text", top=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    r = rows[(1, 1)]
    assert r.term == "apple" and r.tf == 2 and r.df_docs == 1
    assert math.isclose(r.tfidf, 2 * math.log(3), rel_tol=1e-9)
    assert rows[(1, 2)].term == "banana"
    # doc 3: durian tf=1 df=1 beats cherry tf=2 df=2 (2*ln1.5 < ln3)
    assert rows[(3, 1)].term == "durian"
    assert rows[(3, 2)].term == "cherry"


def test_tfidf_tie_break_by_term(spark):
    df = spark.createDataFrame(
        [(1, "bb aa"), (2, "zz yy")], ["doc_id", "text"]
    )
    out = tfidf_top_terms(df, "doc_id", "text", top=2).filter(F.col("doc_id") == 1)
    got = [(r.rank, r.term) for r in out.collect()]
    assert got == [(1, "aa"), (2, "bb")]  # equal tfidf -> term ascending


def test_tfidf_min_token_len(spark):
    df = spark.createDataFrame([(1, "a bb a ccc")], ["doc_id", "text"])
    out = tfidf_top_terms(df, "doc_id", "text", top=5, min_token_len=2)
    assert set(r.term for r in out.collect()) == {"bb", "ccc"}


# ------------------------------------------------------------------- top-k

def _topk_fixture(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 30.0),
        ("a", 3, 30.0),  # tie with event 2 -> event_id breaks it
        ("a", 4, 20.0),
        ("b", 5, 5.0),
    ]
    return spark.createDataFrame(rows, ["grp", "id", "score"])


def test_topk_window_and_agg_agree(spark):
    df = _topk_fixture(spark)
    kw = dict(group_cols=["grp"], order_col="score", k=2, tie_cols=["id"])
    w = topk_per_group(df, **kw)
    a = topk_per_group_agg(df, **kw)
    expect = {("a", 2, 1), ("a", 3, 2), ("b", 5, 1)}
    for out in (w, a):
        got = {(r.grp, r.id, r.rank) for r in out.collect()}
        assert got == expect
    assert sorted(w.columns) == sorted(a.columns)


def test_topk_ascending(spark):
    df = _topk_fixture(spark)
    out = topk_per_group(
        df, ["grp"], "score", k=1, descending=False, tie_cols=["id"]
    )
    got = {(r.grp, r.id) for r in out.collect()}
    assert got == {("a", 1), ("b", 5)}


def test_topk_k_validation(spark):
    df = _topk_fixture(spark)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], "score", k=0)
    with pytest.raises(ValueError):
        topk_per_group_agg(df, ["grp"], "score", k=0)


# --------------------------------------------------------- decontamination

def test_dedup_against(spark):
    corpus = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (4, "y")], ["id", "key"]
    )
    block = spark.createDataFrame([("y",), ("w",)], ["key"])
    for bc in (True, False):
        kept = dedup_against(corpus, block, on="key", broadcast=bc)
        assert {r.id for r in kept.collect()} == {1, 3}


def test_dedup_against_null_keys_survive(spark):
    corpus = spark.createDataFrame([(1, None), (2, "y")], ["id", "key"])
    block = spark.createDataFrame([("y",), (None,)], ["key"])
    kept = dedup_against(corpus, block, on="key")
    # null join keys never match (SQL semantics): the null-key row survives
    assert {r.id for r in kept.collect()} == {1}
