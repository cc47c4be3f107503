"""Streaming windowed top-k (streaming/topk_stream.py): emission on
watermark passage, MG count exactness under capacity, ranking."""

import datetime as dt
import time

import pytest

from pivot_spark.streaming.topk_stream import topk_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def topk_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("topk")
    d = str(base / "events")
    # file 1: window [00:00, 01:00) — a x3, b x2, c x1
    rows1 = [("a", _ts(1)), ("a", _ts(2)), ("a", _ts(3)),
             ("b", _ts(10)), ("b", _ts(20)), ("c", _ts(30))]
    spark.createDataFrame(rows1, "k string, ts timestamp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    time.sleep(1.1)  # distinct mtime: file 2 must arrive in a later micro-batch
    # file 2: far-future event advances the watermark past window 1's end
    rows2 = [("z", _ts(600))]
    spark.createDataFrame(rows2, "k string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d


def test_window_emits_after_watermark(spark, topk_dir):
    src = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(topk_dir)
    )
    out = topk_stream(
        src, "k", "ts", window_duration="1 hour", watermark="1 minute", k=2
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tk_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM tk_out ORDER BY window_start, rank").collect()
    w1 = [r for r in rows if r.window_start == _ts(0)]
    assert [(r.key, r.est_count, r.rank) for r in w1] == [("a", 3, 1), ("b", 2, 2)]


def test_rejects_batch_and_bad_params(spark, topk_dir):
    df = spark.createDataFrame([("a", _ts(0))], "k string, ts timestamp")
    with pytest.raises(ValueError):
        topk_stream(df, "k")
    src = spark.readStream.schema("k string, ts timestamp").parquet(topk_dir)
    with pytest.raises(ValueError):
        topk_stream(src, "k", k=0)
    with pytest.raises(ValueError):
        topk_stream(src, "k", window_duration="1 fortnight")
