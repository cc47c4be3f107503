"""Bucketed-table layout: the shuffle-free co-located join/agg path.

At 100 TB the dominant cost of a repeated fact-fact join (orders x
lineitem, events x sessions, corpus x signatures) is re-shuffling both
sides on every run. Spark's Hive-style bucketing pays that shuffle ONCE
at write time: ``bucketBy(n, keys)`` hash-partitions files on disk, and
every later equi-join or aggregate on the bucket keys reads co-located
buckets — SortMergeJoin with ZERO Exchange (and zero sort, when
``sortBy`` matches). ``tests/test_plans.py`` pins both plan shapes.

Notes for the 1000-executor deployment:

* bucket counts should be a multiple of the cluster's parallelism and
  sized so one bucket's worth of the BIGGER table fits an executor's
  memory (`SURVEY.md §4`); both sides must agree on (keys, n) exactly —
  ``buckets_compatible`` checks that from the catalog.
* bucketed tables require the session catalog (``saveAsTable``); plain
  ``parquet(path)`` writes drop bucket metadata. An explicit ``path``
  keeps data out of the default warehouse while staying catalogued.
* ``spark.sql.sources.v2.bucketing.enabled`` / AQE leave these plans
  alone; bucket pruning on equality filters over the bucket key is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: "list[str] | str",
    num_buckets: int,
    sort: bool = True,
    path: "str | None" = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and, by default,
    sorted) on ``keys`` — the one-time shuffle that all later joins and
    aggregates on those keys skip."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("at least one bucket key required")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"bucket keys not in frame: {missing}")
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (``spark.table``), the
    only path that carries bucket metadata into the optimizer."""
    return spark.table(table)


def bucket_spec(spark: SparkSession, table: str) -> "tuple[list[str], int] | None":
    """(bucket columns, num buckets) of a catalog table, or None if the
    table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    nb = info.get("Num Buckets")
    cols = info.get("Bucket Columns")
    if nb is None or cols is None:
        return None
    names = [c.strip(" `") for c in cols.strip("[]").split(",") if c.strip()]
    return names, int(nb)


def buckets_compatible(spark: SparkSession, left: str, right: str) -> bool:
    """True iff the two tables' bucket layouts make an equi-join on the
    bucket keys shuffle-free: same key names, same bucket count."""
    a, b = bucket_spec(spark, left), bucket_spec(spark, right)
    return a is not None and a == b


def bucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: "list[str] | str | None" = None,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. Raises when the
    layouts are not compatible (the join would silently reintroduce two
    corpus-wide shuffles — the failure mode this module exists to
    prevent)."""
    spec = bucket_spec(spark, left)
    if not buckets_compatible(spark, left, right):
        raise ValueError(
            f"tables {left!r} and {right!r} are not co-bucketed "
            f"({spec} vs {bucket_spec(spark, right)}); "
            "rewrite one side with write_bucketed(keys, num_buckets) "
            "matching the other"
        )
    keys = on if on is not None else spec[0]
    keys = [keys] if isinstance(keys, str) else list(keys)
    return spark.table(left).join(spark.table(right), keys, how)
