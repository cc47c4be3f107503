"""Bucketed-table layout: the co-located join/agg plans must actually
be shuffle-free — pinned at the physical-plan level, because this is
the one surface whose entire value IS the absent Exchange."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.sources.bucketed import (
    bucket_spec,
    bucketed_join,
    buckets_compatible,
    read_bucketed,
    write_bucketed,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    write_bucketed(left, "t_bleft", "k", 8, path=str(base / "l"))
    write_bucketed(right, "t_bright", "k", 8, path=str(base / "r"))
    write_bucketed(right, "t_bother", "k", 16, path=str(base / "o"))
    yield "t_bleft", "t_bright", "t_bother"
    for t in ("t_bleft", "t_bright", "t_bother"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_roundtrip(spark, bucketed_tables):
    left, right, other = bucketed_tables
    assert bucket_spec(spark, left) == (["k"], 8)
    assert bucket_spec(spark, other) == (["k"], 16)
    assert buckets_compatible(spark, left, right)
    assert not buckets_compatible(spark, left, other)


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast: at test scale Spark would broadcast the
    # 5k-row side (and mark the scans "Bucketed: false"); at the 100 TB
    # scale this surface targets, neither side is broadcastable and the
    # co-located SortMergeJoin below IS the plan
    left, right, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, left, right, "k")
        plan = plan_of(out)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert out.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_would_shuffle_both_sides(spark, bucketed_tables):
    # control: the same join WITHOUT bucket metadata shuffles; this is
    # the cost write_bucketed amortizes away
    a = spark.range(0, 10_000).select(F.col("id").alias("k"))
    b = spark.range(0, 5_000).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    with_aqe_off = spark.conf.get("spark.sql.adaptive.enabled")
    plan = plan_of(a.join(b, "k"))
    assert "Exchange" in plan
    assert with_aqe_off is not None  # session untouched


def test_groupby_on_bucket_key_skips_exchange(spark, bucketed_tables):
    left, _, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = read_bucketed(spark, left).groupBy("k").agg(
            F.sum("v").alias("s")
        )
        plan = plan_of(agg)
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mismatched_layout_refuses_silent_shuffle(spark, bucketed_tables):
    left, _, other = bucketed_tables
    with pytest.raises(ValueError, match="not co-bucketed"):
        bucketed_join(spark, left, other)


def test_write_bucketed_validates(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(df, "t_bad", "k", 0)
    with pytest.raises(ValueError, match="not in frame"):
        write_bucketed(df, "t_bad", "nope", 4)
