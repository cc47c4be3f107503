"""Declared correctness queries (SURVEY.md §2.4): P01-P21, P23 + extensions.

Each query is a (spark, sf_dir) -> DataFrame callable built on the public
pivot_spark operators, paired with an ANSI-SQL oracle that DuckDB runs on
the same parquet tables. Column names are aliased identically on both
sides (the driver sorts columns by name before value-hashing). DOUBLE
outputs are rounded to 4 decimals on BOTH sides (FIXTURES.md
canonicalization contract) so summation-order ulps can't flip the hash.

DuckDB-1.0 oracle idioms used here (probed, see tests):
* pivot cell == ANSI ``agg(x) FILTER (cond)``;
* deterministic arg-min with composite key == ``(min({'k': key, 'v': x})
  FILTER (cond)).v`` (struct min is lexicographic, like Spark's
  ``min(struct(...))``);
* first/last by ``(l_orderkey, l_linenumber)`` use the scalar key
  ``l_orderkey*8 + l_linenumber`` (l_linenumber ∈ 1..7) on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pivot_spark.config import PivotConfig
from pivot_spark.operators.dedup import dedup_exact
from pivot_spark.operators.pivot import pivot

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

FLAGS = ["A", "N", "R"]


def query(name: str, oracle: "str | None" = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pivot_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, name)


def _read_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_read`` + round-robin to session parallelism when the scan is
    narrower (guide §2.5 input skew). For the queries whose dominant
    cost is a per-row synthesis/tokenize chain directly over the scan
    (audio/image payload builders, codec roundtrips, shingle UDFs), a
    single-file input otherwise runs the whole chain on ONE core —
    everything downstream of the exchange parallelizes instead.
    Results are unchanged (row-local chains + order-insensitive
    aggregates/joins downstream); a wide input pays no extra shuffle.
    Measured (sf0.1, collect medians): e186 2.72→1.86, e228 1.77→0.66.
    NOT applied where the scan-stage work is cheap relative to the
    exchange (e109 measured 1.69→2.14 with it: regression, reverted)."""
    from pivot_spark.operators._spread import spread_input

    return spread_input(_read(spark, sf_dir, name))


def _mined_pairs(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """MinHash pair mining for the graph-family declared queries
    (num_hashes=128, bands=64 over ``documents``), computed FRESH from
    the parquet input on every call — each consumer query's timing pays
    for its own mining stage (round 7 removed the cross-query memo that
    let ten consumers share one mining pass: a bench row must measure
    computing that query from the inputs, not replaying another row's
    work). The mined pairs are a few hundred rows, so within ONE query
    build they are collected and replayed as a local DataFrame: the
    iterative consumers (pagerank, label propagation) re-read the pair
    frame per iteration, and without the local replay every iteration
    would re-run the whole mining stage. Driver-side state stays
    answer-sized (pair ids + jaccard only)."""
    from pivot_spark.operators.neardup import neardup_minhash_lsh

    docs = _read(spark, sf_dir, "documents")
    pairs = neardup_minhash_lsh(
        docs, threshold=threshold, num_hashes=128, bands=64
    )
    return spark.createDataFrame(pairs.collect(), pairs.schema)


def round_doubles(df: DataFrame, scale: int = 4) -> DataFrame:
    cols = [
        F.round(F.col(f.name), scale).alias(f.name)
        if isinstance(f.dataType, T.DoubleType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def serialize_arrays(df: DataFrame) -> DataFrame:
    """Serialize array columns to the SURVEY.md §2.4 canonical string form
    ``[a|b|c]`` (empty array → ``[]``) so the driver's pandas canonicalizer
    never sees raw (unhashable) lists. Mirrored in oracles with DuckDB
    ``'[' || array_to_string(arr, '|') || ']'``."""
    cols = [
        F.concat(F.lit("["), F.array_join(F.col(f.name), "|"), F.lit("]")).alias(f.name)
        if isinstance(f.dataType, T.ArrayType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _pivot_li(spark, sf_dir, aggregates, *, values="A,N,R", order_by=None, **kw):
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns=f"l_returnflag={values}",
        pivot_rows="l_linenumber",
        aggregates=aggregates,
        order_by=order_by,
        **kw,
    )
    return round_doubles(pivot(df, cfg).output)


def _li_oracle(cells, values=FLAGS, row="l_linenumber", table="lineitem", extra=""):
    """cells: list[(alias, fn)] where fn(filter_sql) -> expression SQL."""
    cols = []
    for v in values:
        f = f"l_returnflag = '{v}'"
        for alias, fn in cells:
            cols.append(f'{fn(f)} AS "{v}_{alias}"')
    return f"SELECT {row}, " + ", ".join(cols) + f" FROM {table} GROUP BY {row}{extra}"
