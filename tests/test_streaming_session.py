"""Streaming sessionization tests (streaming/session_stream.py)."""

import datetime as dt

import pytest

from pivot_spark.streaming.session_stream import session_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sess_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sess") / "events")
    rows = [
        # user 1: session A (0, 5, 10), gap 60 > 30 -> session B (70, 75)
        (1, _ts(0), 1.0),
        (1, _ts(5), 2.0),
        (1, _ts(10), 3.0),
        (1, _ts(70), 4.0),
        (1, _ts(75), 5.0),
        # user 2: one session (0, 20); later far event (200) closes it
        (2, _ts(0), 10.0),
        (2, _ts(20), 10.0),
        (2, _ts(200), 1.0),
    ]
    spark.createDataFrame(rows, "user_id int, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_gap_closed_sessions(spark, sess_dir):
    src = spark.readStream.schema("user_id int, ts timestamp, value double").parquet(sess_dir)
    out = session_stream(src, "user_id", "ts", "value", gap_minutes=30, watermark="1 minute")
    q = out.writeStream.outputMode("append").format("memory").queryName("ss_out").start()
    q.processAllAvailable()
    q.stop()
    rows = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM ss_out").collect()
    }
    # sessions closed by a later in-stream event (gap exceeded):
    assert rows[(1, _ts(0), _ts(10))] == (3, 6.0)
    assert rows[(2, _ts(0), _ts(20))] == (2, 20.0)
    # open sessions (1@70-75, 2@200) can only close via watermark timeout
    # after end-of-stream: not required to be present in a finite drain
    for key in rows:
        assert key[1] <= key[2]


def test_rejects_batch(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "user_id int, ts timestamp, value double")
    with pytest.raises(ValueError):
        session_stream(df)
