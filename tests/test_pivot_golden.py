"""Golden e2e tests reproducing the reference's five PivotTest scenarios
byte-for-byte (PivotTest.java:386-548, FIXTURES.md §A), plus the 2-pivot-
column example-pipeline schema (examples/...-cdap-data-pipeline.json:81-89)
and on-error routing semantics."""

import pytest

from pyspark.sql import types as T

from pivot_spark import OnError, PivotConfig, PivotError, output_schema, pivot


def rows_by_key(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_scenario1_single_column_sum(sales_df):
    # PivotTest.java:386-401
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="sum:sum(Sales)",
    )
    res = pivot(sales_df, cfg)
    assert res.output.columns == ["Product", "Q1_sum", "Q2_sum", "Q3_sum", "Q4_sum"]
    out = rows_by_key(res.output, "Product")
    assert out["Shoes"] == {"Product": "Shoes", "Q1_sum": 100, "Q2_sum": 50, "Q3_sum": 80, "Q4_sum": 50}
    assert out["Shirts"] == {"Product": "Shirts", "Q1_sum": 80, "Q2_sum": None, "Q3_sum": None, "Q4_sum": 70}
    assert out["Socks"] == {"Product": "Socks", "Q1_sum": 40, "Q2_sum": 40, "Q3_sum": 60, "Q4_sum": 90}


def test_scenario2_brand_row_alias_total(sales_df):
    # PivotTest.java:403-419
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Brand",
        aggregates="total:sum(Sales)",
    )
    out = rows_by_key(pivot(sales_df, cfg).output, "Brand")
    assert out["Nike"] == {"Brand": "Nike", "Q1_total": 70, "Q2_total": 60, "Q3_total": 70, "Q4_total": 150}
    assert out["Reebok"] == {"Brand": "Reebok", "Q1_total": 150, "Q2_total": 30, "Q3_total": 70, "Q4_total": 60}


def test_scenario3_string_min_max(sales_df):
    # PivotTest.java:421-437 — case-insensitive string min/max
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="min:min(Brand),max:max(Brand)",
    )
    out = rows_by_key(pivot(sales_df, cfg).output, "Product")
    assert out["Shoes"]["Q1_min"] == "Nike" and out["Shoes"]["Q1_max"] == "Reebok"
    assert out["Shirts"]["Q2_min"] is None and out["Shirts"]["Q2_max"] is None
    assert out["Socks"]["Q1_min"] == "Reebok" and out["Socks"]["Q1_max"] == "Reebok"
    assert out["Socks"]["Q2_min"] == "Nike" and out["Socks"]["Q2_max"] == "Nike"


def test_scenario4_default_value_and_aliases(sales_df):
    # PivotTest.java:439-456
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="sum:sum(Sales)",
        default_value="0",
        field_aliases="Q1_sum:Quarter_1_sum,Q2_sum:Quarter_2_sum",
    )
    res = pivot(sales_df, cfg)
    assert res.output.columns == ["Product", "Quarter_1_sum", "Quarter_2_sum", "Q3_sum", "Q4_sum"]
    out = rows_by_key(res.output, "Product")
    assert out["Shirts"]["Quarter_2_sum"] == 0
    assert out["Shirts"]["Q3_sum"] == 0
    assert out["Shirts"]["Quarter_1_sum"] == 80


def test_scenario5_two_pivot_rows(sales_df):
    # PivotTest.java:533-548
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Brand,Product",
        aggregates="sum:sum(Sales)",
    )
    res = pivot(sales_df, cfg)
    assert res.output.columns[:2] == ["Brand", "Product"]
    out = {(r["Brand"], r["Product"]): r.asDict() for r in res.output.collect()}
    assert len(out) == 6
    assert out[("Nike", "Shoes")]["Q1_sum"] == 50
    assert out[("Nike", "Shirts")]["Q2_sum"] is None
    assert out[("Reebok", "Socks")]["Q1_sum"] == 40
    assert out[("Reebok", "Shoes")]["Q4_sum"] == 10


def test_scenario6_two_pivot_columns(sales_df):
    # examples/pivot_file_source_sink_example-cdap-data-pipeline.json:81-89 —
    # generated schema is Q1_Nike_Sum... (first-declared column first).
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4;Brand=Nike,Reebok,Addidas",
        pivot_rows="Product",
        aggregates="Sum:sum(Sales)",
    )
    res = pivot(sales_df, cfg)
    assert res.output.columns[:4] == ["Product", "Q1_Nike_Sum", "Q1_Reebok_Sum", "Q1_Addidas_Sum"]
    assert len(res.output.columns) == 1 + 12
    out = rows_by_key(res.output, "Product")
    assert out["Shoes"]["Q1_Nike_Sum"] == 50
    assert out["Shoes"]["Q1_Reebok_Sum"] == 50
    assert out["Shoes"]["Q1_Addidas_Sum"] is None
    assert out["Shirts"]["Q4_Nike_Sum"] == 50


def test_output_schema_matches_runtime(sales_df):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2;Brand=Nike,Reebok",
        pivot_rows="Product",
        aggregates="s:sum(Sales),n:count(*),a:avg(Sales),cl:collectlist(Brand)",
        field_aliases="Q1_Nike_s:q1n",
    )
    static = output_schema(cfg, sales_df.schema)
    runtime = pivot(sales_df, cfg).output.schema
    assert [f.name for f in static.fields] == [f.name for f in runtime.fields]
    assert [f.dataType for f in static.fields] == [f.dataType for f in runtime.fields]
    # every generated aggregate column is nullable (Pivot.java:292)
    assert all(f.nullable for f in static.fields[1:])


def test_on_error_skip_keeps_groups(sales_df):
    # partial value list: Q3/Q4 rows excluded from cells, groups survive
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        on_error="skip-error",
    )
    out = rows_by_key(pivot(sales_df, cfg).output, "Product")
    assert set(out) == {"Shoes", "Shirts", "Socks"}
    assert out["Shoes"]["Q1_s"] == 100 and out["Shoes"]["Q2_s"] == 50


def test_on_error_port_routes_bad_groups(spark):
    rows = [("a", "X", 1), ("a", "Y", 2), ("b", "X", 3), ("b", "BAD", 4), ("c", "Y", 5)]
    df = spark.createDataFrame(rows, ["k", "p", "v"])
    cfg = PivotConfig(
        pivot_columns="p=X,Y",
        pivot_rows="k",
        aggregates="s:sum(v)",
        on_error=OnError.ERROR_PORT,
    )
    res = pivot(df, cfg)
    out = rows_by_key(res.output, "k")
    assert set(out) == {"a", "c"}  # group b suppressed
    assert out["a"] == {"k": "a", "X_s": 1, "Y_s": 2}
    errs = res.errors.collect()
    assert [r["k"] for r in errs] == ["b"]
    # "missing data model" diagnostics (Pivot.java:330-353): per pivot
    # column, the sorted distinct undeclared values seen in the group
    assert res.errors.columns == ["k", "p_undeclared"]
    assert errs[0]["p_undeclared"] == ["BAD"]


def test_error_port_undeclared_values_detail(spark):
    rows = [
        ("g1", "X", None, 1),
        ("g1", "BAD1", "U", 2),
        ("g1", "BAD2", "V", 3),
        ("g1", "BAD1", None, 4),
        ("g2", "X", "U", 5),
    ]
    df = spark.createDataFrame(rows, ["k", "p", "q", "v"])
    cfg = PivotConfig(
        pivot_columns="p=X,Y;q=U,V",
        pivot_rows="k",
        aggregates="s:sum(v)",
        on_error=OnError.ERROR_PORT,
    )
    res = pivot(df, cfg)
    errs = {r["k"]: r for r in res.errors.collect()}
    # g1: rows 1-4 are bad (undeclared p or null q); g2 is fully declared
    assert set(errs) == {"g1"}
    assert errs["g1"]["p_undeclared"] == ["BAD1", "BAD2"]
    # SQL NULL recorded as "null" like Java String.valueOf (Pivot.java:337)
    assert errs["g1"]["q_undeclared"] == ["null"]


def test_on_error_fail_raises(spark):
    df = spark.createDataFrame([("a", "X", 1), ("a", "Z", 2)], ["k", "p", "v"])
    cfg = PivotConfig(
        pivot_columns="p=X,Y",
        pivot_rows="k",
        aggregates="s:sum(v)",
        on_error=OnError.FAIL,
    )
    with pytest.raises(PivotError):
        pivot(df, cfg)
    # clean input does not raise
    ok = spark.createDataFrame([("a", "X", 1), ("a", "Y", 2)], ["k", "p", "v"])
    assert pivot(ok, cfg).output.count() == 1


def test_validation_against_schema(sales_df):
    from pivot_spark import PivotConfigError

    cfg = PivotConfig(
        pivot_columns="Nope=Q1",
        pivot_rows="AlsoNope",
        aggregates="s:sum(Brand)",  # non-numeric
    )
    with pytest.raises(PivotConfigError) as e:
        pivot(sales_df, cfg)
    msgs = "\n".join(e.value.errors)
    assert "Nope" in msgs and "AlsoNope" in msgs and "numeric" in msgs


def test_lineage():
    from pivot_spark.operators.pivot import lineage

    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales),n:count(*)",
        field_aliases="Q1_s:q1_total",
    )
    lin = lineage(cfg)
    assert lin["Product"] == ["Product"]
    assert lin["q1_total"] == ["Quarter", "Sales"]  # aliased output tracked
    assert lin["Q2_s"] == ["Quarter", "Sales"]
    # aliases containing underscores parse correctly
    cfg2 = PivotConfig(
        pivot_columns="Quarter=Q1",
        pivot_rows="Product",
        aggregates="my_sum:sum(Sales)",
    )
    assert lineage(cfg2)["Q1_my_sum"] == ["Quarter", "Sales"]
    assert lin["Q1_n"] == ["Quarter"]  # count(*) has no source field
    assert len(lin) == 5


def test_multi_agg_column_order_agg_major(sales_df):
    # reference generateOutputSchema iterates aggregates outer /
    # value-products inner (Pivot.java:283-297) — schema order parity
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales),n:count(*)",
    )
    res = pivot(sales_df, cfg)
    assert res.output.columns == ["Product", "Q1_s", "Q2_s", "Q1_n", "Q2_n"]


def test_approxmedian_matches_exact_on_odd_cells(spark):
    # odd-count cell: the sketch returns the exact middle observation, so
    # APPROXMEDIAN == MEDIAN here; on even counts they may differ (approx
    # picks an observed value, exact interpolates) — documented contract
    rows = [("a", "X", float(v)) for v in [5, 1, 3, 2, 4]] + [("a", "Y", 7.0)]
    df = spark.createDataFrame(rows, ["k", "p", "v"])
    cfg = PivotConfig(
        pivot_columns="p=X,Y",
        pivot_rows="k",
        aggregates="am:approxmedian(v),m:median(v)",
    )
    out = pivot(df, cfg).output.collect()[0]
    assert out["X_am"] == out["X_m"] == 3.0
    assert out["Y_am"] == 7.0
    assert out["X_am"] is not None and isinstance(out["X_am"], float)


def test_decimal_support_schema_parity(spark):
    # the reference rejects DECIMAL for numeric aggregates
    # (AggregationUtils.java:36-39); we support it — declared divergence.
    # Static output_schema must equal the runtime schema.
    df = spark.createDataFrame(
        [("a", "X", "1.50"), ("a", "X", "2.25"), ("a", "Y", None)],
        "g string, p string, v string",
    ).selectExpr("g", "p", "CAST(v AS DECIMAL(10,2)) v")
    cfg = PivotConfig(
        pivot_columns="p=X,Y", pivot_rows="g", aggregates="s:sum(v),a:avg(v),mx:max(v)"
    )
    static = output_schema(cfg, df.schema)
    out = pivot(df, cfg).output
    assert [f.dataType for f in static.fields] == [f.dataType for f in out.schema.fields]
    row = out.collect()[0]
    assert str(row["X_s"]) == "3.75" and row["X_a"] == 1.875
