"""Tests for event-time window aggregation and weighted sampling."""

import datetime
import hashlib
import math

from pyspark.sql import functions as F

from pivot_spark.operators.sample import weighted_sample_k
from pivot_spark.operators.windows import sliding_agg, tumbling_agg

UTC = datetime.timezone.utc


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m, tzinfo=UTC)


def _events(spark):
    rows = [
        (1, _ts(0, 10), "a", 1.0),
        (2, _ts(0, 50), "a", 2.0),
        (3, _ts(1, 5), "a", 4.0),
        (4, _ts(0, 20), "b", 8.0),
    ]
    return spark.createDataFrame(rows, ["id", "ts", "typ", "v"])


def test_tumbling_agg(spark):
    out = tumbling_agg(
        _events(spark), "ts", "1 hour", ["typ"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    ).collect()
    by = {(r["window_start_us"], r["typ"]): r for r in out}
    h0 = int(_ts(0).timestamp() * 1_000_000)
    h1 = int(_ts(1).timestamp() * 1_000_000)
    assert by[(h0, "a")]["n"] == 2 and by[(h0, "a")]["s"] == 3.0
    assert by[(h1, "a")]["n"] == 1
    assert by[(h0, "b")]["s"] == 8.0
    assert all(r["window_end_us"] - r["window_start_us"] == 3_600_000_000 for r in out)


def test_sliding_agg_each_event_in_two_windows(spark):
    out = sliding_agg(
        _events(spark), "ts", "1 hour", "30 minutes", [],
        [F.count(F.lit(1)).alias("n")],
    ).collect()
    assert sum(r["n"] for r in out) == 8  # 4 events x 2 windows
    # event at 00:10 -> windows starting 23:30 and 00:00
    h = int(_ts(0).timestamp() * 1_000_000)
    starts = {r["window_start_us"] for r in out}
    assert h in starts and h - 1_800_000_000 in starts


def _expected_key(doc_id, weight, salt="wsample"):
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:12]
    u = (int(h, 16) + 0.5) / 16**12
    return math.log(u) / weight


def test_weighted_sample_k_matches_formula(spark):
    rows = [(i, "g", float(i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    out = weighted_sample_k(df, "id", "w", k=5).collect()
    expect = sorted(range(20), key=lambda i: -_expected_key(i, i + 1.0))[:5]
    assert sorted(r["id"] for r in out) == sorted(expect)
    for r in out:
        assert abs(r["sample_key"] - _expected_key(r["id"], r["id"] + 1.0)) < 1e-12


def test_weighted_sample_k_per_group_and_weight_bias(spark):
    # one huge weight per group must essentially always be selected
    rows = [(i, f"g{i % 3}", 1e9 if i < 3 else 1.0) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    out = weighted_sample_k(df, "id", "w", k=2, group_col="g").collect()
    assert len(out) == 6
    picked = {r["g"]: [x["id"] for x in out if x["g"] == r["g"]] for r in out}
    for i in range(3):
        assert i in picked[f"g{i}"]  # heavy row always wins its group


def test_weighted_sample_deterministic(spark):
    rows = [(i, float(1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = sorted(r["id"] for r in weighted_sample_k(df, "id", "w", 10).collect())
    b = sorted(r["id"] for r in weighted_sample_k(df.repartition(7), "id", "w", 10).collect())
    assert a == b
