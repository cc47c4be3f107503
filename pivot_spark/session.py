"""SparkSession factory with scale-appropriate defaults.

Local-mode settings tuned per the bench contract (local[$SPARK_GRAFT_CPUS]);
on a real cluster the same code runs unchanged — AQE handles partition
coalescing and skew, shuffle width follows cluster defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pivot_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[N] runs driver + all executor threads in ONE JVM: size the
        # heap for N concurrent tasks, not for a driver. 8g showed suite-
        # long GC inflation (late queries 3-6x their isolated medians).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # default codegen cache (100 classes) thrashes across a 130+
        # query suite — every rerun recompiles every stage
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        # progress bars interleave with stdout and can corrupt the
        # bench's one-line JSON contract (BENCH_r02 was truncated by
        # exactly this)
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
