"""Streaming dedup tests: file-backed streams drained to memory sinks."""

import pytest

from pyspark.sql import functions as F

from pivot_spark.streaming.dedup_stream import dedup_stream, first_seen_stream


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dup") / "events")
    rows = [(1, "click", 10), (1, "click", 11), (2, "view", 12), (2, "click", 13), (1, "click", 14)]
    spark.createDataFrame(rows, "user_id int, event_type string, ts_s int").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _drain(stream_df, name, mode="append"):
    q = stream_df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()


def test_dedup_stream(spark, dup_dir):
    src = spark.readStream.schema("user_id int, event_type string, ts_s int").parquet(dup_dir)
    _drain(dedup_stream(src, ["user_id", "event_type"]), "dd_out")
    rows = spark.sql("SELECT user_id, event_type FROM dd_out").collect()
    assert {(r[0], r[1]) for r in rows} == {(1, "click"), (2, "view"), (2, "click")}
    assert len(rows) == 3


def test_dedup_stream_watermarked(spark, dup_dir):
    src = (
        spark.readStream.schema("user_id int, event_type string, ts_s int")
        .parquet(dup_dir)
        .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
    )
    out = dedup_stream(src, ["user_id", "event_type"], event_time="ts", watermark="10 seconds")
    _drain(out, "ddw_out")
    assert spark.sql("SELECT count(*) FROM ddw_out").collect()[0][0] == 3


def test_first_seen_stream(spark, dup_dir):
    src = (
        spark.readStream.schema("user_id int, event_type string, ts_s int")
        .parquet(dup_dir)
        .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
    )
    out = first_seen_stream(
        src, ["user_id", "event_type"], event_time="ts", watermark="10 seconds"
    )
    _drain(out, "fs_out")
    rows = spark.sql("SELECT user_id, event_type FROM fs_out").collect()
    assert {(r[0], r[1]) for r in rows} == {(1, "click"), (2, "view"), (2, "click")}
    assert len(rows) == 3


def test_rejects_batch(spark):
    df = spark.range(3).withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="streaming"):
        dedup_stream(df, ["id"])
    with pytest.raises(ValueError, match="streaming"):
        first_seen_stream(df, ["id"], event_time="ts")
