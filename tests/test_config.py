"""Config parsing/validation tests — mirrors the reference's validation
unit tests (PivotTest.java:458-531) plus parser edge cases."""

import pytest

from pivot_spark.config import OnError, PivotConfig, PivotConfigError


def test_parse_basic():
    c = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="sum:sum(Sales)",
    )
    assert c.columns == {"Quarter": ["Q1", "Q2", "Q3", "Q4"]}
    assert c.rows == ["Product"]
    assert len(c.aggs) == 1
    assert c.aggs[0].alias == "sum" and c.aggs[0].func == "SUM" and c.aggs[0].field == "Sales"
    assert c.error_mode is OnError.SKIP


def test_parse_two_columns_order_preserved():
    c = PivotConfig(
        pivot_columns="Quarter=Q1,Q2;Brand=Nike,Reebok,Addidas",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    assert list(c.columns.keys()) == ["Quarter", "Brand"]
    assert c.columns["Brand"] == ["Nike", "Reebok", "Addidas"]
    # first-declared column varies slowest in the cartesian product
    names = [n for _, n in c.cell_names()]
    assert names[:3] == ["Q1_Nike_s", "Q1_Reebok_s", "Q1_Addidas_s"]
    assert names[-1] == "Q2_Addidas_s"


def test_count_star_routes_to_countall():
    c = PivotConfig(pivot_columns="a=x", pivot_rows="b", aggregates="n:count(*)")
    assert c.aggs[0].func == "COUNTALL" and c.aggs[0].field is None


def test_malformed_pivot_columns():
    # PivotTest.java:458-481
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(pivot_columns="Quarter:Q1,Q2", pivot_rows="p", aggregates="s:sum(x)")
    assert any("format" in m for m in e.value.errors)


def test_malformed_alias():
    # PivotTest.java:483-506
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(
            pivot_columns="Quarter=Q1",
            pivot_rows="p",
            aggregates="s:sum(x)",
            field_aliases="Q1_sum=renamed",
        )
    assert any("field_aliases" in m for m in e.value.errors)


def test_aggregate_without_field():
    # PivotTest.java:508-531 — sum() with no field is invalid
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(pivot_columns="Quarter=Q1", pivot_rows="p", aggregates="s:sum()")
    assert any("requires a field" in m for m in e.value.errors)


def test_more_than_two_pivot_columns_rejected():
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(pivot_columns="a=1;b=2;c=3", pivot_rows="p", aggregates="s:sum(x)")
    assert any("at most 2" in m for m in e.value.errors)


def test_errors_accumulate():
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(pivot_columns="bad", pivot_rows="", aggregates="nope")
    assert len(e.value.errors) >= 3


def test_unknown_function():
    with pytest.raises(PivotConfigError) as e:
        PivotConfig(pivot_columns="a=1", pivot_rows="p", aggregates="s:mode(x)")
    assert any("unknown aggregate function" in m for m in e.value.errors)


def test_structured_inputs():
    c = PivotConfig(
        pivot_columns={"Quarter": ["Q1", "Q2"]},
        pivot_rows=["Product", "Brand"],
        aggregates=[("s", "sum", "Sales"), ("n", "countall", None)],
        field_aliases={"Q1_s": "first_quarter"},
        on_error=OnError.ERROR_PORT,
    )
    assert c.rows == ["Product", "Brand"]
    assert c.output_column_name(("Q1",), "s") == "first_quarter"
    assert c.output_column_name(("Q2",), "s") == "Q2_s"
