"""Streaming EWMA anomaly tests (streaming/anomaly_stream.py)."""

import datetime as dt

import pytest

from pivot_spark.streaming.anomaly_stream import ewma_anomaly_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def anom_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("anom") / "events")
    # user 1: stable ~10 with jitter, then a 100 spike
    rows = [(1, _ts(i), 10.0 + (0.5 if i % 2 else -0.5)) for i in range(10)]
    rows.append((1, _ts(10), 100.0))
    rows.append((1, _ts(11), 10.0))
    # user 2: too few events for scoring
    rows += [(2, _ts(0), 5.0), (2, _ts(1), 6.0)]
    spark.createDataFrame(rows, "user_id int, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_spike_flagged(spark, anom_dir):
    src = spark.readStream.schema("user_id int, ts timestamp, value double").parquet(anom_dir)
    out = ewma_anomaly_stream(src, "user_id", "ts", "value", alpha=0.2, z_threshold=3.0, min_n=5)
    q = out.writeStream.outputMode("append").format("memory").queryName("an_out").start()
    q.processAllAvailable()
    q.stop()
    rows = {
        (r.user_id, r.ts): r for r in spark.sql("SELECT * FROM an_out").collect()
    }
    assert len(rows) == 14
    spike = rows[(1, _ts(10))]
    assert spike.is_anomaly and spike.z is not None and spike.z > 3.0
    # warm-up events unscored
    assert rows[(1, _ts(0))].z is None and not rows[(1, _ts(0))].is_anomaly
    assert rows[(1, _ts(3))].z is None
    # stable events after warm-up scored but not anomalous
    assert rows[(1, _ts(8))].z is not None and not rows[(1, _ts(8))].is_anomaly
    # ewma tracks the level
    assert abs(rows[(1, _ts(9))].ewma - 10.0) < 1.0
    # user 2 never reaches min_n
    assert rows[(2, _ts(1))].z is None
    # exactly-once emission, state is per-key
    assert sum(1 for k in rows if k[0] == 2) == 2


def test_rejects_batch_and_validates(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "user_id int, ts timestamp, value double")
    with pytest.raises(ValueError):
        ewma_anomaly_stream(df)
