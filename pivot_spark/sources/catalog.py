"""Source catalog for the driver testdata (TESTDATA.md).

The reference gets its inputs from separate CDAP source plugins (CSV file
source in examples/pivot_file_source_sink_example-cdap-data-pipeline.json:46-53);
our engine's sources are Spark's native readers — parquet first (columnar,
predicate pushdown, column pruning), csv/json/orc supported the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(MICROS) without timezone — Spark
    # reads it as TIMESTAMP_NTZ. Epoch math uses
    # unix_micros(cast(ts as timestamp)) under the UTC session tz below.
    # oracle parity: any tz-sensitive expression must agree with DuckDB
    # regardless of how the calling session was built (driver harness
    # sessions are not ours to configure)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
