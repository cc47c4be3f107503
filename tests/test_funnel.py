"""Funnel operator unit tests (operators/funnel.py)."""

import pytest

from pivot_spark.operators.funnel import funnel

STEPS = ["click", "view", "purchase"]


def _run(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = funnel(df, STEPS, "user_id", "ts", "event_type")
    return {r.user_id: r for r in out.collect()}


def test_full_conversion_in_order(spark):
    r = _run(spark, [(1, 10, "click"), (1, 20, "view"), (1, 30, "purchase")])
    row = r[1]
    assert (row.step1_ts, row.step2_ts, row.step3_ts) == (10, 20, 30)
    assert row.funnel_depth == 3 and row.converted


def test_out_of_order_steps_dont_count(spark):
    # view happens BEFORE the first click -> step2 incomplete
    r = _run(spark, [(2, 20, "view"), (2, 30, "click"), (2, 40, "purchase")])
    assert r[2].step1_ts == 30 and r[2].step2_ts is None
    assert r[2].funnel_depth == 1 and not r[2].converted


def test_strictly_after_semantics(spark):
    # view at the SAME instant as click does not advance the funnel
    r = _run(spark, [(3, 10, "click"), (3, 10, "view")])
    assert r[3].step2_ts is None and r[3].funnel_depth == 1


def test_earliest_qualifying_occurrence_wins(spark):
    r = _run(
        spark,
        [(4, 10, "click"), (4, 5, "click"), (4, 8, "view"), (4, 9, "view"), (4, 12, "view")],
    )
    # first click 5; first view after 5 is 8 (not 12)
    assert r[4].step1_ts == 5 and r[4].step2_ts == 8


def test_user_without_first_step(spark):
    r = _run(spark, [(5, 10, "view"), (5, 20, "purchase")])
    assert r[5].funnel_depth == 0 and not r[5].converted


def test_every_user_emitted_once(spark):
    rows = [(u, t, e) for u in (1, 2) for t, e in [(1, "click"), (2, "other")]]
    out = _run(spark, rows)
    assert set(out) == {1, 2}


def test_empty_steps_raise(spark):
    df = spark.createDataFrame([(1, 1, "x")], "user_id long, ts long, event_type string")
    with pytest.raises(ValueError):
        funnel(df, [])


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 1, "click")], "user_id long, ts long, event_type string")
    plan = funnel(df, STEPS)._jdf.queryExecution().executedPlan().toString()
    # chained windows + groupBy all share the user_id partitioning
    assert plan.count("Exchange hashpartitioning") == 1
