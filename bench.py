"""Benchmark runner: executes the declared query set on $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) under local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). The first query
additionally pays JVM/session warm-up; a warm-up action runs first so the
numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pivot_spark.session import get_spark
    from pivot_spark.plans.declared import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM + file index before timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        runs = []
        for _ in range(reps):
            # queries are independent: drop DataFrames persisted by the
            # previous run so cache blocks can't evict/GC-thrash this one
            spark.catalog.clearCache()
            # localCheckpoint() blocks are RDD-level persists that
            # clearCache() does NOT release — without this they
            # accumulate across the suite and inflate later queries
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = len(df.collect())
            runs.append(time.perf_counter() - t0)
            assert n >= 0
        # median: single-run numbers swing +-25% from GC/python-worker
        # lifecycle noise (BASELINE.md protocol is median-of-3)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
    total = round(sum(timings.values()), 3)

    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = None

    print(
        json.dumps(
            {
                "metric": "declared_query_set_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
