"""Stream-stream interval join (streaming/join_stream.py)."""

import datetime as dt

import pytest

from pivot_spark.streaming.join_stream import interval_join_stream

T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sjoin")
    ld, rd = str(root / "clicks"), str(root / "buys")
    clicks = [
        (1, _ts(0), "c1"),
        (1, _ts(8), "c2"),
        (1, _ts(30), "c3"),
        (2, _ts(0), "c4"),
    ]
    buys = [
        (1, _ts(10), 99.0),   # c1 (10m back) and c2 qualify
        (2, _ts(40), 5.0),    # c4 too old (40m back > 10m lookback)
    ]
    spark.createDataFrame(
        clicks, "user_id int, click_ts timestamp, click_id string"
    ).write.parquet(ld)
    spark.createDataFrame(
        buys, "user_id int, buy_ts timestamp, amount double"
    ).write.parquet(rd)
    return ld, rd


def test_interval_join_matches_window(spark, dirs):
    ld, rd = dirs
    l = spark.readStream.schema(
        "user_id int, click_ts timestamp, click_id string"
    ).parquet(ld)
    r = spark.readStream.schema(
        "user_id int, buy_ts timestamp, amount double"
    ).parquet(rd)
    out = interval_join_stream(
        l, r, "user_id", "click_ts", "buy_ts", lookback="10 minutes"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (r.user_id, r.click_id) for r in spark.sql("SELECT * FROM sj_out").collect()
    }
    assert rows == {(1, "c1"), (1, "c2")}


def test_rejects_batch_and_collisions(spark, dirs):
    ld, _ = dirs
    batch = spark.read.parquet(ld)
    stream = spark.readStream.schema(
        "user_id int, click_ts timestamp, click_id string"
    ).parquet(ld)
    with pytest.raises(ValueError, match="streaming"):
        interval_join_stream(
            batch, stream, "user_id", "click_ts", "click_ts", "10 minutes"
        )
    with pytest.raises(ValueError, match="collision"):
        interval_join_stream(
            stream, stream, "user_id", "click_ts", "click_ts", "10 minutes"
        )
