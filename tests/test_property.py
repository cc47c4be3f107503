"""Property-based test: for random small tables, the pivot operator must
agree with a direct pure-Python model of the reference semantics
(null-skipping aggregates, undeclared-value exclusion, empty-cell
identities per SURVEY.md §2.2)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pivot_spark import PivotConfig, pivot

GROUPS = ["g1", "g2", "g3"]
PIVOTS = ["X", "Y", "Z"]  # Z is NOT declared -> excluded from cells

row = st.tuples(
    st.sampled_from(GROUPS),
    st.sampled_from(PIVOTS),
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
)


def model(rows):
    """Expected output: {group: {cell_col: value}} for declared values X,Y
    with s:sum (empty->None), c:count (empty->0), la:logicaland of v>0
    (empty->True)."""
    out = {}
    for g in sorted({r[0] for r in rows}):
        cells = {}
        for v in ("X", "Y"):
            vals = [r[2] for r in rows if r[0] == g and r[1] == v and r[2] is not None]
            cells[f"{v}_s"] = sum(vals) if vals else None
            cells[f"{v}_c"] = len(vals)
            cells[f"{v}_la"] = all(x > 0 for x in vals)  # vacuous True on empty
        out[g] = cells
    return out


@pytest.mark.usefixtures("spark")
@given(rows=st.lists(row, min_size=1, max_size=30))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pivot_matches_model(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, p string, v int").withColumn(
        "pos", F.col("v") > 0
    )
    cfg = PivotConfig(
        pivot_columns="p=X,Y",
        pivot_rows="g",
        aggregates="s:sum(v),c:count(v),la:logicaland(pos)",
    )
    got = {
        r["g"]: {k: r[k] for k in r.asDict() if k != "g"}
        for r in pivot(df, cfg).output.collect()
    }
    assert got == model(rows)
