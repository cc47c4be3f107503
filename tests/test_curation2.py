"""Unit tests: as-of join, hash split, quantile buckets, PII redaction,
repetition signals."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.asof import asof_join
from pivot_spark.operators.bucketize import ntile_buckets, threshold_buckets
from pivot_spark.operators.repetition import repetition_signals
from pivot_spark.operators.sample import hash_split
from pivot_spark.functions.redact import redact_pii


# ------------------------------------------------------------- as-of join

def _asof_frames(spark):
    left = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 101, 25), ("u1", 102, 5), ("u2", 200, 50)],
        ["k", "lid", "lts"],
    )
    right = spark.createDataFrame(
        [("u1", 900, 8), ("u1", 901, 20), ("u1", 902, 25), ("u3", 903, 1)],
        ["k", "rid", "rts"],
    )
    return left, right


def test_asof_backward(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    got = {r.lid: r.rid_r for r in out.collect()}
    # lts=10 -> rts=8; lts=25 -> rts=25 (exact match inclusive); lts=5 -> none
    assert got == {100: 900, 101: 902, 102: None, 200: None}
    assert out.count() == left.count()  # every left row survives


def test_asof_forward(spark):
    left, right = _asof_frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="forward"
    )
    got = {r.lid: r.rid_r for r in out.collect()}
    # lts=10 -> rts=20; lts=25 -> rts=25 inclusive; lts=5 -> rts=8
    assert got == {100: 901, 101: 902, 102: 900, 200: None}


def test_asof_tolerance(spark):
    left, right = _asof_frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", tolerance=2
    )
    got = {r.lid: r.rid_r for r in out.collect()}
    # lts=10 matched rts=8 at distance 2 (kept); lts=25->25 dist 0
    assert got == {100: 900, 101: 902, 102: None, 200: None}
    out1 = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", tolerance=1
    )
    got1 = {r.lid: r.rid_r for r in out1.collect()}
    assert got1[100] is None  # distance 2 > tolerance 1 nulled out


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([("u1", 1, 10)], ["k", "lid", "lts"])
    right = spark.createDataFrame(
        [("u1", 7, 10), ("u1", 9, 10), ("u1", 8, 10)], ["k", "rid", "rts"]
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", tie_col="rid"
    )
    assert out.collect()[0].rid_r == 9  # max tie_col wins


def test_asof_bad_direction(spark):
    left, right = _asof_frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                  direction="nearest")


# ------------------------------------------------------------- hash split

def test_hash_split_disjoint_exhaustive(spark):
    df = spark.range(3000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 3000  # exhaustive: every row has a split
    assert abs(counts["train"] / 3000 - 0.8) < 0.05
    assert abs(counts["valid"] / 3000 - 0.1) < 0.03
    # deterministic
    again = hash_split(df, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0


def test_hash_split_validates_weights(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.6})


# ---------------------------------------------------------------- buckets

def test_ntile_buckets_ansi(spark):
    # 5 rows, 2 tiles -> ANSI remainder rule: first tile gets 3 rows
    df = spark.createDataFrame(
        [("g", i, i * 10) for i in range(1, 6)], ["grp", "id", "score"]
    )
    out = ntile_buckets(df, ["grp"], "score", 2, tie_cols=["id"])
    got = {r.id: r.bucket for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2}


def test_threshold_buckets_monotone(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") % 100).alias("v"))
    out = threshold_buckets(df, "v", 4, relative_error=0.0001)
    rows = out.select("v", "bucket").distinct().collect()
    # bucket must be monotone in v and roughly quartile-balanced
    by_v = sorted((r.v, r.bucket) for r in rows)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(by_v, by_v[1:]))
    counts = [r["count"] for r in out.groupBy("bucket").count().collect()]
    assert len(counts) == 4
    assert all(abs(c - 250) <= 30 for c in counts)


# ------------------------------------------------------------- redaction

def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org now"),
            (2, "server 192.168.1.250 down"),
            (3, "ssn 987-65-4321 leaked"),
            (4, "call +44 20 7946-0958 today"),
            (5, "clean text stays clean"),
        ],
        ["id", "t"],
    )
    got = {r.id: r.red for r in
           df.select("id", redact_pii(F.col("t")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server <IP> down"
    assert got[3] == "ssn <SSN> leaked"
    assert "<PHONE>" in got[4]
    assert got[5] == "clean text stays clean"


# ------------------------------------------------------ repetition signals

def test_repetition_signals_hand(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one word repeated
            (2, "all words here are unique"),
            (3, "x"),                            # single word: no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.distinct_words) == (4, 1)
    assert r1.dup_word_frac == pytest.approx(0.75)
    assert r1.n_bigrams == 3
    assert r1.top_bigram_frac == pytest.approx(1.0)  # "spam spam" x3
    r2 = rows[2]
    assert r2.dup_word_frac == 0.0
    assert r2.top_bigram_frac == pytest.approx(0.25)
    r3 = rows[3]
    assert (r3.n_words, r3.n_bigrams) == (1, 0)
    assert r3.top_bigram_frac == 0.0
