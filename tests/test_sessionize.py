"""Sessionization tests: gap logic, single-shuffle plan, streaming
session windows."""

import pytest

from pyspark.sql import functions as F

from pivot_spark.operators.sessionize import session_stats, sessionize, sessionize_stream


@pytest.fixture(scope="module")
def ev_df(spark):
    rows = [
        # user 1: two sessions (gap 100 between 300 and 1000)
        (1, 1, 100),
        (1, 2, 200),
        (1, 3, 300),
        (1, 4, 1000),
        # user 2: one session
        (2, 5, 50),
        (2, 6, 60),
    ]
    return spark.createDataFrame(rows, "user_id int, event_id int, ts long")


def test_sessionize_gap(spark, ev_df):
    out = sessionize(ev_df, "user_id", "ts", gap=100, order_cols=["event_id"])
    got = {(r["user_id"], r["event_id"]): r["session_idx"] for r in out.collect()}
    assert got[(1, 1)] == 0 and got[(1, 2)] == 0 and got[(1, 3)] == 0
    assert got[(1, 4)] == 1
    assert got[(2, 5)] == 0 and got[(2, 6)] == 0


def test_session_stats(spark, ev_df):
    out = session_stats(ev_df, "user_id", "ts", gap=100, order_cols=["event_id"])
    got = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration"]) for r in out.collect()}
    assert got[(1, 0)] == (3, 200)
    assert got[(1, 1)] == (1, 0)
    assert got[(2, 0)] == (2, 10)


def test_single_exchange(spark, ev_df):
    out = sessionize(ev_df, "user_id", "ts", gap=100, order_cols=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share one partitioning: exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_stream(spark, ev_df, tmp_path):
    d = str(tmp_path / "ev")
    ev_df.withColumn("ts", F.timestamp_seconds(F.col("ts"))).write.parquet(d)
    src = spark.readStream.schema("user_id int, event_id int, ts timestamp").parquet(d)
    out = sessionize_stream(
        src, "user_id", "ts", gap="100 seconds", watermark="1 second",
        agg_cols=[F.min("event_id").alias("first_event")],
    )
    q = out.writeStream.outputMode("complete").format("memory").queryName("sw").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT user_id, n_events, first_event FROM sw").collect()
    got = {(r[0], r[2]): r[1] for r in rows}
    assert got[(1, 1)] == 3  # session starting at event 1
    assert got[(1, 4)] == 1
    assert got[(2, 5)] == 2

    with pytest.raises(ValueError, match="streaming"):
        sessionize_stream(ev_df, "user_id", "ts", gap="1 minute", watermark="1 second")
