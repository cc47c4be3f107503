"""Bloom filter build/probe/prefiltered anti-join (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_prefilter_anti_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        [(i, f"key{i}") for i in range(500)], "id int, k string"
    ).cache()
    block = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 500, 10)], "k string"
    ).cache()
    return corpus, block


def test_no_false_negatives(spark, frames):
    corpus, block = frames
    bf = bloom_build(block, "k", num_bits=1 << 12, num_hashes=5)
    got = corpus.withColumn("hit", bloom_contains(bf, F.col("k")))
    members = {r["id"] for r in got.filter("hit").collect()}
    # every true member must hit (Bloom guarantees no false negatives)
    assert set(range(0, 500, 10)) <= members


def test_fp_rate_reasonable(spark, frames):
    corpus, block = frames
    bf = bloom_build(block, "k", num_bits=1 << 12, num_hashes=5)
    hits = corpus.withColumn("hit", bloom_contains(bf, F.col("k"))).filter("hit").count()
    # 50 members; 4096 bits / 50 keys ~ 80 bits/key -> FP ~ 0
    assert hits <= 60


def test_prefilter_anti_join_is_exact(spark, frames):
    corpus, block = frames
    got = bloom_prefilter_anti_join(corpus, block, "k", num_bits=1 << 12, num_hashes=5)
    exact = corpus.join(block, "k", "left_anti")
    assert {r["id"] for r in got.collect()} == {r["id"] for r in exact.collect()}


def test_null_keys_do_not_crash(spark):
    corpus = spark.createDataFrame([(1, None), (2, "a")], "id int, k string")
    block = spark.createDataFrame([("a",), (None,)], "k string")
    bf = bloom_build(block, "k", num_bits=256, num_hashes=3)
    rows = corpus.withColumn("hit", bloom_contains(bf, F.col("k"))).collect()
    assert all(r["hit"] for r in rows)  # both 'a' and null were inserted


def test_bad_num_bits(spark, frames):
    _, block = frames
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(block, "k", num_bits=100)


def test_probe_is_pure_catalyst(spark, frames):
    corpus, block = frames
    bf = bloom_build(block, "k", num_bits=1 << 12, num_hashes=5)
    out = corpus.withColumn("hit", bloom_contains(bf, F.col("k")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
