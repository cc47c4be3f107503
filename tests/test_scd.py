"""SCD2 history build + incremental apply (operators/scd.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.scd import scd2_apply, scd2_build


def _ts(d):
    return datetime.datetime(2024, 1, d)


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        # key 1: a -> a (collapse) -> b -> b (collapse)
        (1, "a", _ts(1), 1),
        (1, "a", _ts(2), 2),
        (1, "b", _ts(3), 3),
        (1, "b", _ts(4), 4),
        # key 2: single version
        (2, "x", _ts(1), 5),
        # key 3: null handling — NULL -> NULL collapses, NULL -> c changes
        (3, None, _ts(1), 6),
        (3, None, _ts(2), 7),
        (3, "c", _ts(3), 8),
        # key 4: same-day flip, tiebreak decides order
        (4, "p", _ts(5), 9),
        (4, "q", _ts(5), 10),
    ]
    return spark.createDataFrame(rows, "k int, v string, ord timestamp, tb int")


def _as_map(df):
    return {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_build_collapses_and_closes(changes):
    hist = scd2_build(changes, ["k"], ["v"], "ord", tiebreak=["tb"])
    got = _as_map(hist)
    assert got[(1, _ts(1))] == ("a", _ts(3), False)
    assert got[(1, _ts(3))] == ("b", None, True)
    assert got[(2, _ts(1))] == ("x", None, True)
    # NULL -> NULL is no change; NULL -> c is a change
    assert got[(3, _ts(1))] == (None, _ts(3), False)
    assert got[(3, _ts(3))] == ("c", None, True)
    # same order value: tiebreak orders p before q -> zero-length interval
    assert got[(4, _ts(5))][2] in (False, True)
    assert len([k for k in got if k[0] == 4]) == 1 or len(got) == 7


def test_build_same_key_same_order_tiebreak(spark):
    rows = [(1, "p", 5, 1), (1, "q", 5, 2)]
    df = spark.createDataFrame(rows, "k int, v string, ord int, tb int")
    hist = scd2_build(df, ["k"], ["v"], "ord", tiebreak=["tb"])
    got = {(r["v"]): (r["valid_to"], r["is_current"]) for r in hist.collect()}
    assert got == {"p": (5, False), "q": (None, True)}


@pytest.fixture(scope="module")
def hist(spark, changes):
    return scd2_build(changes, ["k"], ["v"], "ord", tiebreak=["tb"]).cache()


def test_apply_update_close_and_insert(spark, hist):
    delta = spark.createDataFrame(
        [
            (1, "z", _ts(9)),   # change -> close (1,b), open (1,z)
            (2, "x", _ts(9)),   # unchanged -> no-op
            (9, "new", _ts(9)), # unknown key -> insert
        ],
        "k int, v string, ord timestamp",
    )
    out = scd2_apply(hist, delta, ["k"], ["v"], "ord")
    got = _as_map(out)
    assert got[(1, _ts(3))] == ("b", _ts(9), False)
    assert got[(1, _ts(9))] == ("z", None, True)
    assert got[(2, _ts(1))] == ("x", None, True)
    assert got[(9, _ts(9))] == ("new", None, True)
    # closed history untouched
    assert got[(1, _ts(1))] == ("a", _ts(3), False)
    # one current row per key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_apply_late_delta_ignored(spark, hist):
    # delta older than the open version's valid_from: history unchanged
    delta = spark.createDataFrame(
        [(1, "z", _ts(2))], "k int, v string, ord timestamp"
    )
    out = scd2_apply(hist, delta, ["k"], ["v"], "ord")
    assert _as_map(out) == _as_map(hist)


def test_apply_equals_build_on_suffix(spark, changes):
    """apply(build(first half), latest-of-second-half) == build(first half
    + latest-of-second-half rows) when the delta is strictly newer."""
    first = changes.filter(F.col("ord") < _ts(3))
    hist1 = scd2_build(first, ["k"], ["v"], "ord", tiebreak=["tb"])
    second = changes.filter(F.col("ord") >= _ts(3))
    latest = second.groupBy("k").agg(
        F.max_by(F.struct("v", "ord"), F.struct("ord", "tb")).alias("s")
    ).select("k", "s.v", "s.ord")
    applied = scd2_apply(hist1, latest, ["k"], ["v"], "ord")

    replay = first.unionByName(
        latest.withColumn("tb", F.lit(999))
    )
    expected = scd2_build(replay, ["k"], ["v"], "ord", tiebreak=["tb"])
    assert _as_map(applied) == _as_map(expected)


def test_apply_never_shuffles_history(spark, hist, tmp_path):
    # materialize the history so the plan shows apply's own work, not the
    # build lineage
    hist.write.parquet(str(tmp_path / "hist"))
    stored = spark.read.parquet(str(tmp_path / "hist"))
    delta = spark.createDataFrame(
        [(1, "z", _ts(9))], "k int, v string, ord timestamp"
    )
    out = scd2_apply(stored, delta, ["k"], ["v"], "ord")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # broadcast joins only: no exchange may hash-partition the history
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan


def test_scd2_lookup_point_in_time(spark):
    from pivot_spark.operators.scd import scd2_lookup

    dim = spark.createDataFrame(
        [
            (1, "bronze", 0, 100),
            (1, "silver", 100, 200),
            (1, "gold", 200, None),
            (2, "bronze", 50, None),
        ],
        "k long, tier string, valid_from long, valid_to long",
    )
    fact = spark.createDataFrame(
        [(10, 1, 0), (11, 1, 150), (12, 1, 200), (13, 1, 9999), (14, 2, 10), (15, 3, 60)],
        "fid long, k long, ts long",
    )
    out = {r.fid: r for r in scd2_lookup(fact, dim, ["k"], "ts").collect()}
    assert out[10].tier == "bronze"        # boundary: vf <= ts
    assert out[11].tier == "silver"
    assert out[12].tier == "gold"          # vt exclusive
    assert out[13].tier == "gold"          # open version
    assert out[14].tier is None            # before first version
    assert out[15].tier is None            # unknown key kept (left)
    assert len(out) == 6                   # at most one version each
    inner = scd2_lookup(fact, dim, ["k"], "ts", how="inner")
    assert inner.count() == 4
    import pytest as _pt

    with _pt.raises(ValueError):
        scd2_lookup(fact, dim, ["k"], "ts", how="full")
