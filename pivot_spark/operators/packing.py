"""Deterministic corpus shuffle + sequence packing for training-data prep.

Before LLM training, a corpus is (a) globally shuffled so batches are not
correlated with ingest order, and (b) packed: documents are concatenated
and cut into fixed token-budget sequences (GPT-style pack-then-split).
Both must be *deterministic* — re-running the pipeline, on any engine and
any partitioning, must place every document in the same shard, position,
and bin, or training runs are not reproducible.

Design (100 TB): a driver-side global sort is impossible, and even a
distributed total order (rangepartition + global prefix sum) serializes on
a second pass over partition boundaries. Instead the corpus is split into
``n_shards`` pseudo-random shards by an md5 hash of the id (engine-portable,
partition-independent), and ordering + packing happen *within* each shard:
one exchange on the shard key, one in-partition sort, one running-sum
window — shards are fully independent, so parallelism = n_shards and no
global barrier exists. Readers that consume shards in any order still see
a deterministic, shuffled, packed corpus.

The md5-hex ordering trick is the same engine-portable device as
``operators/sample.py`` (hash-threshold sampling); the DuckDB oracle
replays the identical layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_hex(id_col: str, salt: str) -> Column:
    return F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic pseudo-random shard + intra-shard order for a corpus.

    Adds ``shard`` (int, from the first 16 md5 bits) and ``h`` (the md5 hex,
    the intra-shard sort key). Order by ``(shard, h, id)`` is a
    deterministic global permutation independent of input partitioning.
    """
    if not 1 <= n_shards <= 1 << 16:
        raise ValueError("n_shards must be in [1, 65536]")
    h = _hash_hex(id_col, salt)
    return df.withColumn("h", h).withColumn(
        "shard",
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("int") % n_shards),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Assign every document a deterministic ``(shard, off, bin)``:
    concatenate the shard's documents in hash order and cut every
    ``budget`` size units — ``off`` is the document's start offset in its
    shard, ``bin = off // budget`` its training-sequence index.

    One exchange (hash by shard) + one in-partition sort + one running-sum
    window; shards never synchronize.
    """
    sharded = shuffle_shard(df, id_col, n_shards, salt)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sharded.select(
        id_col,
        "shard",
        F.coalesce(F.sum(size_col).over(w), F.lit(0)).alias("off"),
    ).withColumn("bin", (F.col("off") / budget).cast("bigint"))
