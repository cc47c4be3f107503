"""Physical-plan regression tests: pin the plan shapes the 100 TB design
depends on (single exchange, column pruning, broadcast sides) so a
refactor can't silently regress them."""

import pytest

from pyspark.sql import functions as F

from pivot_spark import OnError, PivotConfig, pivot


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_single_exchange_and_pruned_scan(spark, tmp_path, sales_df):
    path = str(tmp_path / "sales_pq")
    sales_df.write.parquet(path)
    df = spark.read.parquet(path)
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    out = pivot(df, cfg).output
    plan = plan_of(out)
    # one shuffle: partial agg -> exchange on group key -> final agg
    assert plan.count("Exchange hashpartitioning") == 1
    # column pruning: Brand/ShopID never reach the scan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "Quarter" in read and "Product" in read and "Sales" in read
    assert "Brand" not in read and "ShopID" not in read


def test_error_port_anti_join_broadcasts(spark, sales_df):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        on_error=OnError.ERROR_PORT,
    )
    res = pivot(sales_df, cfg)
    plan = plan_of(res.output)
    # bad-group-key side is tiny: must be a broadcast join, never SMJ
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


@pytest.fixture()
def vec_df(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_single_scan_no_join(spark, vec_df):
    """cosine_topk ships the query matrix in the mapInPandas closure:
    the corpus is scanned once with NO join and the only shuffle is the
    tiny (n_queries x k)-row final merge keyed by query id."""
    from pivot_spark.operators.similarity import cosine_topk

    q = vec_df.filter(F.col("vec_id") <= 1)
    out = cosine_topk(vec_df, q, k=2)
    plan = plan_of(out)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") - plan.count("Exchange SinglePartition") <= 1
    assert "MapInPandas" in plan


def test_num_partitions_respected(spark, sales_df):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        num_partitions=7,
    )
    out = pivot(sales_df, cfg).output
    assert "hashpartitioning(Product" in plan_of(out)
    assert out.count() == 3


def test_filter_pushdown_reaches_scan(spark, tmp_path, sales_df):
    path = str(tmp_path / "sales_pq2")
    sales_df.write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("Quarter") == "Q1")
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    plan = plan_of(pivot(df, cfg).output)
    assert "PushedFilters: [" in plan and "Quarter" in plan.split("PushedFilters")[1][:80]


def test_bucketed_join_avoids_shuffle(spark, tmp_path, sales_df):
    from pivot_spark.sources.io import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(sales_df, "sales_a", "Product", num_buckets=4)
        write_bucketed_table(
            sales_df.select("Product", "Sales"), "sales_b", "Product", num_buckets=4
        )
        a, b = spark.table("sales_a"), spark.table("sales_b")
        joined = a.join(b, "Product")
        plan = plan_of(joined)
        # co-located layout: the join runs with ZERO exchanges
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS sales_a")
        spark.sql("DROP TABLE IF EXISTS sales_b")
