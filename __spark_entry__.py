"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship two-pivot-column query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2.4 P01-P23
plus extension operators), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL per query; keys without an oracle
get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: two-pivot-column sum over lineitem at sf0.001."""
    from pivot_spark.plans.declared import QUERIES

    return QUERIES["p17"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pivot_spark.plans.declared import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pivot_spark.plans.declared import ORACLES

    return dict(ORACLES)
