"""Tests for deterministic shuffle-sharding and sequence packing."""

import hashlib

import pytest

from pyspark.sql import functions as F

from pivot_spark.operators.packing import pack_sequences, shuffle_shard


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_shuffle_shard_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["id"])
    out = {r["id"]: (r["shard"], r["h"]) for r in shuffle_shard(df, "id", 8, "s1").collect()}
    for i in range(50):
        h = _md5(f"s1:{i}")
        assert out[i] == (int(h[:4], 16) % 8, h)


def test_shuffle_shard_partitioning_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    a = sorted(shuffle_shard(df, "id", 16, "x").collect())
    b = sorted(shuffle_shard(df.repartition(7), "id", 16, "x").collect())
    assert a == b


def test_pack_sequences_offsets_and_bins(spark):
    df = spark.createDataFrame([(i, 10) for i in range(30)], ["id", "n_tok"])
    out = pack_sequences(df, "id", "n_tok", budget=25, n_shards=1, salt="p").collect()
    assert len(out) == 30
    # single shard: docs in md5 order, offsets 0,10,20,...; bin = off // 25
    order = sorted(range(30), key=lambda i: _md5(f"p:{i}"))
    by_id = {r["id"]: r for r in out}
    for pos, i in enumerate(order):
        assert by_id[i]["off"] == pos * 10
        assert by_id[i]["bin"] == (pos * 10) // 25
    # every bin holds <= ceil(25/10)+1 docs and bins are contiguous from 0
    bins = sorted({r["bin"] for r in out})
    assert bins == list(range(bins[-1] + 1))


def test_pack_sequences_shards_independent(spark):
    df = spark.createDataFrame([(i, 7) for i in range(200)], ["id", "n_tok"])
    out = pack_sequences(df, "id", "n_tok", budget=21, n_shards=4, salt="q")
    rows = out.collect()
    # per shard: offsets start at 0 and step by exactly the doc size
    for s in {r["shard"] for r in rows}:
        offs = sorted(r["off"] for r in rows if r["shard"] == s)
        assert offs == [i * 7 for i in range(len(offs))]


def test_shard_bounds_validated(spark):
    df = spark.createDataFrame([(1, 2)], ["id", "n"])
    with pytest.raises(ValueError):
        shuffle_shard(df, "id", 0)
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "n", budget=10, n_shards=1 << 17)


# --------------------------------------------------------------------------
# packing.py::length_batches
# --------------------------------------------------------------------------

def test_length_batches_groups_similar_lengths(spark):
    from pivot_spark.operators.packing import length_batches

    # lengths 1..100 -> with B=10, batch 0 holds 100..91 etc.; grouping
    # by length makes every batch's efficiency >= 91/100 while one
    # random batch of the same data would sit near 0.5
    rows = [(i, i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    out = {r["batch"]: r for r in length_batches(df, "doc_id", "n", 10).collect()}
    assert len(out) == 10
    assert all(r["n_rows"] == 10 for r in out.values())
    assert out[0]["max_len"] == 100 and out[9]["max_len"] == 10
    assert all(r["pad_efficiency"] >= 0.5 for r in out.values())
    assert out[0]["pad_efficiency"] >= 0.95
    # total rows conserved, padded >= sum
    assert sum(r["sum_len"] for r in out.values()) == sum(range(1, 101))
    assert all(r["padded_len"] >= r["sum_len"] for r in out.values())


def test_length_batches_edges(spark):
    import pytest

    from pivot_spark.operators.packing import length_batches

    df = spark.createDataFrame(
        [(1, 5), (2, None), (None, 3), (3, 5)], "doc_id int, n int"
    )
    out = length_batches(df, "doc_id", "n", 64).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 2  # NULLs excluded
    assert out[0]["pad_efficiency"] == 1.0  # equal lengths: no waste
    with pytest.raises(ValueError, match="batch_size"):
        length_batches(df, "doc_id", "n", 0)
