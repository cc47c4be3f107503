"""classification_report + rendezvous sharding."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.analytics import classification_report
from pivot_spark.operators.sharding import rebalance_report, rendezvous_shard


def test_classification_report_hand_computed(spark):
    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),   # a: 2 tp, 1 fn
        ("b", "b"),                            # b: 1 tp
        ("c", "a"),                            # c: never predicted right
    ]
    df = spark.createDataFrame(rows, "label string, pred string")
    out = {r["class"]: r for r in classification_report(df, "label", "pred").collect()}
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert (a.n_true, a.n_pred, a.tp) == (3, 3, 2)
    assert a.precision == pytest.approx(2 / 3)
    assert a.recall == pytest.approx(2 / 3)
    assert a.f1 == pytest.approx(2 / 3)
    b = out["b"]
    assert b.precision == pytest.approx(1 / 2)  # predicted b twice, 1 right
    assert b.recall == 1.0
    c = out["c"]
    assert (c.n_true, c.n_pred, c.tp) == (1, 0, 0)
    assert c.precision == 0.0 and c.recall == 0.0 and c.f1 == 0.0
    # accuracy constant on all rows
    assert a.accuracy == pytest.approx(3 / 5)
    assert a.accuracy == b.accuracy == c.accuracy


def test_classification_report_pred_only_class(spark):
    df = spark.createDataFrame([("a", "z")], "label string, pred string")
    out = {r["class"]: r for r in classification_report(df, "label", "pred").collect()}
    assert out["z"].n_true == 0 and out["z"].n_pred == 1


def test_rendezvous_stability_and_balance(spark):
    n = 2000
    df = spark.createDataFrame([(i,) for i in range(n)], "key long")
    rep = rebalance_report(df, "key", n_from=8, n_to=10).first()
    assert rep.n_keys == n
    # HRW guarantee: moved share ~ (10-8)/10, and NEVER worse than mod-hash (~0.8)
    assert rep.moved_share == pytest.approx(0.2, abs=0.05)
    assert rep.expected_share == pytest.approx(0.2)
    # balance: hottest shard near uniform (1/8, 1/10)
    assert rep.max_share_from < 0.18
    assert rep.max_share_to < 0.15
    # keys that stay map identically (determinism)
    tags = df.select(
        rendezvous_shard(F.col("key"), 8).alias("a"),
        rendezvous_shard(F.col("key"), 8).alias("b"),
    ).filter("a != b").count()
    assert tags == 0
    with pytest.raises(ValueError):
        rebalance_report(df, "key", 0, 8)
    with pytest.raises(ValueError):
        rendezvous_shard(F.col("key"), 0)


def test_rocchio_separable(spark):
    from pivot_spark.operators.classifier import rocchio_predict, rocchio_train

    rows = [
        (1, "cat", "meow purr whiskers feline meow"),
        (2, "cat", "purr meow feline paws"),
        (3, "dog", "woof bark fetch canine woof"),
        (4, "dog", "bark woof canine tail"),
    ]
    df = spark.createDataFrame(rows, "id long, label string, text string")
    model = rocchio_train(df, "label", "text")
    # model is L2-normalized per label
    norms = (
        model.groupBy("label")
        .agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
        .collect()
    )
    for r in norms:
        assert r.n2 == pytest.approx(1.0)
    test = spark.createDataFrame(
        [(10, "meow feline"), (11, "bark fetch"), (12, "")],
        "id long, text string",
    )
    out = {r.id: r for r in rocchio_predict(test, model, "text").collect()}
    assert out[10].pred == "cat" and out[10].margin > 0
    assert out[11].pred == "dog" and out[11].margin > 0
    assert out[12].pred is None
    with pytest.raises(ValueError):
        rocchio_train(df, "label", "text", num_buckets=0)
    with pytest.raises(ValueError):
        rocchio_predict(test, [], "text")
