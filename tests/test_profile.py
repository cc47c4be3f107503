"""Column profiling unit tests (operators/profile.py)."""

import pytest

from pivot_spark.operators.profile import profile


@pytest.fixture()
def df(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "b", 2.5, "x"),
        (2, None, None, "y"),
        (3, "a", 4.0, "y"),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double, t string")


def _by_col(out):
    return {r.column: r for r in out.collect()}


def test_counts_and_nulls(df):
    p = _by_col(profile(df, exact_distinct=True))
    assert all(p[c].n_rows == 4 for c in p)
    assert p["id"].n_nulls == 0 and p["s"].n_nulls == 1 and p["v"].n_nulls == 1


def test_distinct_ignores_nulls(df):
    p = _by_col(profile(df, exact_distinct=True))
    assert p["id"].n_distinct == 3 and p["s"].n_distinct == 2


def test_numeric_stats(df):
    p = _by_col(profile(df, exact_distinct=True))
    assert (p["v"].num_min, p["v"].num_max) == (1.5, 4.0)
    assert p["v"].num_mean == pytest.approx(round((1.5 + 2.5 + 4.0) / 3, 4))
    assert p["v"].str_min is None


def test_string_stats(df):
    p = _by_col(profile(df, exact_distinct=True))
    assert (p["s"].str_min, p["s"].str_max) == ("a", "b")
    assert p["s"].num_mean is None


def test_column_subset_and_order(df):
    out = profile(df, ["v", "id"], exact_distinct=True)
    assert [r.column for r in out.collect()] == ["v", "id"]


def test_approx_distinct_close(spark):
    big = spark.range(5000).withColumnRenamed("id", "x")
    p = _by_col(profile(big))
    assert abs(p["x"].n_distinct - 5000) / 5000 < 0.05


def test_unknown_column_raises(df):
    with pytest.raises(ValueError):
        profile(df, ["nope"])


def test_dtype_reported(df):
    p = _by_col(profile(df))
    assert p["id"].dtype == "bigint" and p["s"].dtype == "string"
