"""Bucketized range-join unit tests (operators/range_join.py)."""

import pytest

from pivot_spark.operators.range_join import range_join


@pytest.fixture()
def frames(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 100)], "pid long, p long"
    )
    ivs = spark.createDataFrame(
        [(10, 0, 11), (20, 10, 20), (30, 24, 26), (40, 200, 300)],
        "iid long, s long, e long",
    )
    return pts, ivs


def _pairs(out):
    return {(r.pid, r.iid) for r in out.collect()}


def test_matches_equal_theta_join(frames):
    pts, ivs = frames
    got = _pairs(range_join(pts, ivs, "p", "s", "e", bucket_width=7))
    expect = {
        (p.pid, i.iid)
        for p in pts.collect()
        for i in ivs.collect()
        if i.s <= p.p < i.e
    }
    assert got == expect and got == {(1, 10), (2, 10), (2, 20), (3, 30)}


def test_end_exclusive(spark):
    pts = spark.createDataFrame([(1, 10)], "pid long, p long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    assert range_join(pts, ivs, "p", "s", "e", 4).count() == 0


def test_no_duplicate_pairs_across_buckets(spark):
    # interval spans many buckets; each matching point appears ONCE
    pts = spark.createDataFrame([(i, i) for i in range(50)], "pid long, p long")
    ivs = spark.createDataFrame([(9, 0, 50)], "iid long, s long, e long")
    out = range_join(pts, ivs, "p", "s", "e", bucket_width=3)
    assert out.count() == 50
    assert out.select("pid").distinct().count() == 50


def test_bucket_width_invariance(frames):
    pts, ivs = frames
    for w in (1, 2, 5, 50, 1000):
        assert _pairs(range_join(pts, ivs, "p", "s", "e", w)) == {
            (1, 10), (2, 10), (2, 20), (3, 30)
        }


def test_extra_equi_keys(spark):
    pts = spark.createDataFrame([(1, "a", 5), (2, "b", 5)], "pid long, k string, p long")
    ivs = spark.createDataFrame([(10, "a", 0, 10)], "iid long, k string, s long, e long")
    got = _pairs(range_join(pts, ivs, "p", "s", "e", 4, on=["k"]))
    assert got == {(1, 10)}


def test_left_join_keeps_unmatched_points(frames):
    pts, ivs = frames
    out = range_join(pts, ivs, "p", "s", "e", 7, how="left")
    rows = {r.pid: r.iid for r in out.collect()}
    assert rows[4] is None and out.count() == 5  # 4 matches + 1 unmatched


def test_validation(frames):
    pts, ivs = frames
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "s", "e", 0)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "s", "e", 5, how="full")
    with pytest.raises(ValueError):
        range_join(pts.withColumnRenamed("pid", "iid"), ivs, "p", "s", "e", 5)


def test_plan_is_equi_join_not_bnlj(frames):
    pts, ivs = frames
    plan = (
        range_join(pts, ivs, "p", "s", "e", 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
