"""Streaming pivot tests: a parquet-backed file stream driven to
completion must produce exactly the batch pivot's result."""

import pytest

from pyspark.sql import functions as F

from pivot_spark import PivotConfig, pivot
from pivot_spark.streaming.pivot_stream import pivot_stream


@pytest.fixture(scope="module")
def sales_dir(spark, sales_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src") / "sales")
    sales_df.write.mode("overwrite").parquet(d)
    return d


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_matches_batch(spark, sales_df, sales_dir):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="s:sum(Sales),n:count(*),mx:max(Brand)",
    )
    stream = spark.readStream.schema(sales_df.schema).parquet(sales_dir)
    _drain(pivot_stream(stream, cfg), "pv_out")
    got = {r["Product"]: r.asDict() for r in spark.sql("SELECT * FROM pv_out").collect()}
    want = {r["Product"]: r.asDict() for r in pivot(sales_df, cfg).output.collect()}
    assert got == want


def test_stream_windowed_with_watermark(spark, sales_df, sales_dir):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    stream = (
        spark.readStream.schema(sales_df.schema)
        .parquet(sales_dir)
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000)))
    )
    out = pivot_stream(
        stream, cfg, event_time="ts", watermark="1 minute", window_duration="5 minutes"
    )
    assert "window" in out.columns
    _drain(out, "pv_win")
    rows = spark.sql("SELECT * FROM pv_win").collect()
    assert len(rows) == 3  # one window x three products
    got = {r["Product"]: r["Q1_s"] for r in rows}
    assert got == {"Shoes": 100, "Shirts": 80, "Socks": 40}


def test_stream_rejects_batch_df(sales_df):
    cfg = PivotConfig(pivot_columns="Quarter=Q1", pivot_rows="Product", aggregates="s:sum(Sales)")
    with pytest.raises(ValueError, match="streaming"):
        pivot_stream(sales_df, cfg)


def test_stream_rejects_error_port(spark, sales_df, sales_dir):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        on_error="send-to-error-port",
    )
    stream = spark.readStream.schema(sales_df.schema).parquet(sales_dir)
    with pytest.raises(ValueError, match="skip-error"):
        pivot_stream(stream, cfg)


def test_stream_update_mode(spark, sales_df, sales_dir):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="n:count(*)",
    )
    stream = spark.readStream.schema(sales_df.schema).parquet(sales_dir)
    q = (
        pivot_stream(stream, cfg)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("pv_upd")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["Product"]: r["Q1_n"] for r in spark.sql("SELECT * FROM pv_upd").collect()}
    assert got == {"Shoes": 2, "Shirts": 2, "Socks": 1}
