"""Streaming P-square quantile tests (streaming/quantile_stream.py)."""

import datetime as dt

import pytest

from pivot_spark.streaming.quantile_stream import quantile_stream

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def q_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qstr") / "events")
    # key 1: values 1..200 shuffled deterministically -> p50 ~ 100
    vals = [((i * 37) % 200) + 1 for i in range(200)]
    rows = [(1, T0 + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(vals)]
    # key 2: tiny stream (exact small-sample path)
    rows += [(2, T0 + dt.timedelta(seconds=i), float(v)) for i, v in enumerate([5.0, 1.0, 9.0])]
    spark.createDataFrame(rows, "user_id int, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_p2_median_estimate(spark, q_dir):
    src = spark.readStream.schema("user_id int, ts timestamp, value double").parquet(q_dir)
    out = quantile_stream(src, "user_id", "ts", "value", p=0.5)
    q = out.writeStream.outputMode("append").format("memory").queryName("q_out").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM q_out").collect()
    last = {}
    for r in rows:
        if r.user_id not in last or r.n > last[r.user_id].n:
            last[r.user_id] = r
    assert last[1].n == 200
    # P-square tolerance: within ~10% of the true median 100.5
    assert abs(last[1].estimate - 100.5) < 12
    assert last[2].n == 3
    assert last[2].estimate == 5.0  # exact order statistic for n<5


def test_rejects_batch_and_validates(spark):
    df = spark.createDataFrame([(1, T0, 1.0)], "user_id int, ts timestamp, value double")
    with pytest.raises(ValueError):
        quantile_stream(df)
