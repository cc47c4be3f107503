"""Tests for grouped OLS, cohort retention, transition matrix."""

from pyspark.sql import functions as F

from pivot_spark.operators.analytics import (
    US_PER_WEEK,
    cohort_retention,
    grouped_ols,
    transition_matrix,
)


def test_grouped_ols_exact_line(spark):
    # g=a: y = 2x + 1 exactly; g=b: constant x -> NULL fit
    rows = [("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
            ("b", 4.0, 1.0), ("b", 4.0, 2.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    a = out["a"]
    assert a["n"] == 3 and a["slope"] == 2.0 and a["intercept"] == 1.0 and a["r2"] == 1.0
    b = out["b"]
    assert b["slope"] is None and b["intercept"] is None and b["r2"] is None


def test_grouped_ols_zero_y_variance(spark):
    rows = [("a", 0.0, 5.0), ("a", 1.0, 5.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    r = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 0.0 and r["intercept"] == 5.0 and r["r2"] is None


def test_cohort_retention(spark):
    w = US_PER_WEEK
    rows = [
        (1, 0), (1, w), (1, 2 * w),       # cohort 0, active weeks 0,1,2
        (2, 0), (2, 2 * w),               # cohort 0, weeks 0,2
        (3, w), (3, w + 1),               # cohort 1, week 1 (dup week)
    ]
    df = spark.createDataFrame(rows, ["uid", "ts_us"])
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(df, "uid", "ts_us").collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1 and out[(0, 2)] == 2
    assert out[(1, 0)] == 1 and (1, 1) not in out


def test_transition_matrix(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),   # a->b, b->c
    ]
    df = spark.createDataFrame(rows, ["uid", "seq", "state"])
    out = {(r["from_state"], r["to_state"]): r
           for r in transition_matrix(df, "uid", "state", ["seq"]).collect()}
    assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["prob"] == 1.0
    assert out[("b", "a")]["prob"] == 0.5 and out[("b", "c")]["prob"] == 0.5
    assert ("c", None) not in out and len(out) == 3
