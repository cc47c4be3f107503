"""Skew-handling utilities — the manual fallbacks for when AQE's
runtime mitigation (skewJoin, partition coalescing — enabled by default
in ``session.get_spark``) isn't applicable.

What Spark already gives us (and we therefore do NOT reimplement):
* hash aggregates run partial/final — a hot group key is pre-combined
  per task before the shuffle, so plain sum/count/min/max need no salt;
* sort-merge joins get AQE skew splitting.

What still skews at 100 TB and the tools here address:
* ``count_distinct_skewed`` — exact distinct counting: the distinct set
  of a hot key cannot be pre-combined, so stage 1 deduplicates on
  (key, value) — spreading the hot key across reducers BY VALUE — and
  stage 2 counts per key. Two shuffles, each skew-free.
* ``salted_join`` — broadcast-impossible joins against a skewed fact
  side when AQE cannot split (e.g. the skew is in one in-flight
  partition): explode the dimension side ``salt`` ways and route fact
  rows to a deterministic salt bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_distinct_skewed(
    df: DataFrame, keys: Sequence[str], value_col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count, skew-resistant: shuffle 1 partitions
    by (key, value) — a key with 10^9 distinct values spreads over the
    whole cluster — shuffle 2 merges small per-key partial counts.
    NULL values are ignored, matching ``F.count_distinct`` semantics."""
    keys = list(keys)
    dedup = (
        df.select(*keys, value_col)
        .filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.lit(1).alias("__one"))
    )
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_name))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dimension side replicated ``salt`` times and
    fact rows routed to a deterministic bucket, splitting each hot join
    key across ``salt`` reducers. Use when the dim side is too big to
    broadcast but small enough to replicate ``salt``-fold.

    Only inner/left joins are supported: with right/full outer, dim rows
    unmatched in one salt bucket would survive as salt-fold duplicates
    (each replica is unmatched independently)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "replicated dim rows make right/full outer results salt-fold "
            "duplicated"
        )
    if salt < 2:
        return fact.join(dim, on, how)
    fact_cols = fact.columns
    dim_cols = [c for c in dim.columns if c != on]
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt))
    )
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = f.join(d, on=[on, "__salt"], how=how)
    return out.select(*fact_cols, *dim_cols)


def skew_report(
    df: DataFrame, key_cols: Sequence[str], num_ranges: int = 32
) -> DataFrame:
    """One-row skew diagnosis for a prospective shuffle key: (n_keys
    BIGINT, n_rows BIGINT, max_count BIGINT — heaviest key's rows,
    max_share DOUBLE — its fraction, gini DOUBLE — inequality of the
    per-key size distribution, 0 = uniform, →1 = one key owns
    everything; both rounded 4). The number that tells you whether this
    key needs salting BEFORE you run the join.

    Gini via the average-rank identity 2·Σ(r·x)/(n·Σx) − (n+1)/n
    (tie-correct), with ranks from the distributed range-partitioned
    prefix (``profile._avg_rank_map``) — state stays distinct-key-sized
    and nothing row-sized is globally sorted."""
    from pivot_spark.operators.profile import _avg_rank_map

    keys = list(key_cols)
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__x"))
    sizes = sizes.select(F.col("__x").cast("double").alias("__x"))
    ranks = _avg_rank_map(sizes, "__x", num_ranges)
    ranked = sizes.join(ranks, "__x")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__x").cast("long").alias("n_rows"),
        F.max("__x").cast("long").alias("max_count"),
        F.round(F.max("__x") / F.sum("__x"), 4).alias("max_share"),
        F.round(
            2.0 * F.sum(F.col("__r___x") * F.col("__x"))
            / (F.count(F.lit(1)) * F.sum("__x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
    )
