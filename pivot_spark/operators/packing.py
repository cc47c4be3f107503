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


def curriculum_order(
    df: DataFrame,
    difficulty_col: str,
    tiebreak_col: str,
    n_buckets: int = 8,
    ascending: bool = True,
    out_col: str = "train_order",
) -> DataFrame:
    """Deterministic difficulty-stratified training order: rank the
    corpus by a difficulty signal, split the ranking into ``n_buckets``
    contiguous strata, and interleave the strata round-robin — every
    consecutive window of ``n_buckets`` positions in the emitted order
    draws one example from each difficulty stratum (position
    ``pos_in_bucket`` of stratum b lands at global slot
    ``~ pos_in_bucket * n_buckets + b``). The standard deterministic
    alternative to RNG-shuffled curriculum sampling: balanced
    mini-batches, reproducible on any engine/partitioning, no seed
    state.

    Scale: two parallel-prefix row ranks (``profile.row_rank`` — range
    partition + broadcast offsets, no global sort, no driver
    materialization) and one broadcast single-row count; everything
    else is arithmetic on the rank. Bucket boundaries are the exact
    ntile split ``bucket = (rank-1)*n_buckets div n`` so the layout is
    a pure function of the data (oracle-replayable with two
    row_number windows).

    Output: input columns + (difficulty_rank, bucket, pos_in_bucket,
    ``out_col``)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pivot_spark.operators.profile import row_rank

    d = F.col(difficulty_col)
    base = df.filter(d.isNotNull() & F.col(tiebreak_col).isNotNull())
    order = [d.asc() if ascending else d.desc(), F.col(tiebreak_col).asc()]
    ranked = row_rank(base, order, out_col="__r")
    cnt = base.agg(F.count(F.lit(1)).alias("__n"))
    b = F.expr(f"(__r - 1) * {n_buckets} DIV __n")
    pos = F.expr(
        f"__r - ((((__r - 1) * {n_buckets} DIV __n) * __n + {n_buckets - 1})"
        f" DIV {n_buckets})"
    )
    staged = (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumns(
            {
                "difficulty_rank": F.col("__r"),
                "bucket": b.cast("int"),
                "pos_in_bucket": pos,
            }
        )
        .drop("__r", "__n")
    )
    return row_rank(
        staged,
        [F.col("pos_in_bucket"), F.col("bucket")],
        out_col=out_col,
    )


def length_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int = 64,
) -> DataFrame:
    """Length-grouped batch planning (the dynamic-padding trick every
    training loader uses: batching similar-length sequences shrinks the
    pad-to-max waste): order rows by ``len_col`` DESC (ties by id),
    chunk the global order into batches of ``batch_size``, and report
    each batch's padding economics.

    The global order comes from ``row_rank`` — range partition +
    per-partition row_number + broadcast prefix offsets — so NO global
    single-partition sort exists at any corpus size; the batch report
    is answer-sized (corpus_rows / batch_size rows).

    Output per batch: (batch INT, n_rows, max_len, sum_len,
    padded_len = n_rows * max_len, pad_efficiency = sum/padded 4dp —
    1.0 means zero wasted pad positions). Rows with NULL id/length are
    excluded.
    """
    from pivot_spark.operators.profile import row_rank

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(len_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"), F.col(len_col).cast("long").alias("__n")
    )
    ranked = row_rank(
        base, [F.col("__n").desc(), F.col("__id")], out_col="__rk"
    )
    agg = (
        ranked.withColumn(
            "batch",
            F.expr(f"CAST((__rk - 1) div {batch_size} AS INT)"),
        )
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("__n").alias("max_len"),
            F.sum("__n").alias("sum_len"),
        )
    )
    padded = F.col("n_rows") * F.col("max_len")
    return agg.select(
        "batch", "n_rows", "max_len", "sum_len",
        padded.alias("padded_len"),
        F.round(F.col("sum_len") / padded.cast("double"), 4).alias(
            "pad_efficiency"
        ),
    )
