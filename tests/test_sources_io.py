"""File source/sink tests: the reference's example pipeline shape
(delimited file -> Pivot -> file sink,
``examples/pivot_file_source_sink_example-cdap-data-pipeline.json``)
re-expressed as spark.read -> pivot -> df.write."""

import os

import pytest

from pivot_spark import PivotConfig
from pivot_spark.sources.io import read_source, run_file_pipeline, write_sink


@pytest.fixture(scope="module")
def csv_src(sales_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("io") / "sales_csv")
    sales_df.coalesce(1).write.mode("overwrite").option("header", True).csv(d)
    return d


def test_csv_roundtrip_schema(spark, sales_df, csv_src):
    back = read_source(spark, csv_src, "csv")
    assert set(back.columns) == set(sales_df.columns)
    assert back.count() == sales_df.count()
    # explicit schema skips inference and pins types
    typed = read_source(
        spark,
        csv_src,
        "csv",
        schema="Quarter string, Product string, Brand string, Sales int, ShopID int",
    )
    assert dict(typed.dtypes)["Sales"] == "int"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_write_formats(spark, sales_df, tmp_path, fmt):
    path = str(tmp_path / f"out_{fmt}")
    write_sink(sales_df, path, fmt)
    back = read_source(
        spark,
        path,
        fmt,
        schema=sales_df.schema if fmt in ("json", "csv") else None,
    )
    assert back.count() == sales_df.count()


def test_partitioned_sink_prunes(spark, sales_df, tmp_path):
    path = str(tmp_path / "by_quarter")
    write_sink(sales_df, path, "parquet", partition_by=["Quarter"])
    assert os.path.isdir(os.path.join(path, "Quarter=Q1"))
    pruned = read_source(spark, path, "parquet").filter("Quarter = 'Q1'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "Quarter" in plan.split("PartitionFilters")[1][:120]
    assert pruned.count() == 5


def test_file_pipeline_end_to_end(spark, csv_src, tmp_path):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    out = run_file_pipeline(
        spark,
        csv_src,
        cfg,
        str(tmp_path / "sink"),
        schema="Quarter string, Product string, Brand string, Sales int, ShopID int",
    )
    back = read_source(spark, str(tmp_path / "sink"), "parquet")
    got = {r["Product"]: r["Q1_s"] for r in back.collect()}
    assert got == {"Shoes": 100, "Shirts": 80, "Socks": 40}


def test_error_port_sink(spark, csv_src, tmp_path):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3",  # Q4 undeclared
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        on_error="send-to-error-port",
    )
    run_file_pipeline(
        spark,
        csv_src,
        cfg,
        str(tmp_path / "main"),
        error_path=str(tmp_path / "errors"),
        schema="Quarter string, Product string, Brand string, Sales int, ShopID int",
    )
    errs = read_source(spark, str(tmp_path / "errors"), "parquet")
    assert errs.columns == ["Product", "Quarter_undeclared"]
    assert errs.count() > 0
    assert all(r["Quarter_undeclared"] == ["Q4"] for r in errs.collect())


def test_bad_format_rejected(spark, sales_df, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_sink(sales_df, str(tmp_path / "x"), "xml")


def test_write_manifest(spark, tmp_path):
    import json

    from pivot_spark.sources.io import write_manifest

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)], ["id", "s", "x"]
    )
    p = str(tmp_path / "manifest.json")
    m = write_manifest(df, p, "unit-test-ds", extra={"run": "r2"})
    on_disk = json.loads(open(p).read())
    assert on_disk == json.loads(json.dumps(m))
    assert m["n_rows"] == 3 and m["extra"]["run"] == "r2"
    cols = {c["column"]: c for c in m["columns"]}
    assert cols["s"]["n_nulls"] == 1
    assert cols["x"]["num_max"] == 2.5
    assert {s["name"] for s in m["schema"]} == {"id", "s", "x"}
