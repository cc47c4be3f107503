"""Driver-hash hygiene guards over EVERY declared oracle.

The driver materializes the DuckDB oracle through pandas before hashing,
so two silent type/canonicalization classes flip a correct query red
(round-3 verdict, What's-wrong items 1-3):

1. an uncast HUGEINT column (DuckDB ``sum(int)``) becomes float64 in
   pandas — ``1981.0`` vs Spark's ``1981``;
2. an IEEE ``-0.0`` survives DuckDB's ``round`` but not Spark's HALF_UP
   BigDecimal round — ``-0.0`` vs ``0.0``.

These tests DESCRIBE every oracle (no HUGEINT/UHUGEINT column may bind)
and execute every oracle at sf0.001 (no emitted cell may be ``-0.0``),
so a new oracle with either landmine fails CI before it reaches a
driver rotation window.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from pivot_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_oracle_emits_hugeint(con):
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        cols = [(c, ty) for c, ty, *_ in desc if "HUGEINT" in ty.upper()]
        if cols:
            bad[name] = cols
    assert not bad, f"oracles emitting HUGEINT (CAST AS BIGINT them): {bad}"


def test_type_parity_spark_vs_oracle(con, spark):
    """Every oracle's DESCRIBE types must map 1:1 onto the Spark result
    schema. The driver's hash is type-aware (e152 went red on HUGEINT vs
    BIGINT with identical values; e104 was latently red on DECIMAL vs
    DOUBLE), so type drift IS a correctness bug here.

    The same per-query build loop also enforces the global physical-plan
    invariant from tools/plan_audit.py: NO declared batch query may plan
    a CartesianProduct (the 32x32-partition-pair landmine BASELINE.md
    documents — broadcast the tiny side instead)."""
    from tools.type_parity import compare

    bad = {}
    cartesian = []
    for name, fn in entry_mod.queries().items():
        sql = entry_mod.oracle_sql().get(name)
        if sql is None:
            continue
        sdf = fn(spark, SF_DIR)
        probs = compare(sdf.dtypes, con.execute(f"DESCRIBE {sql}").fetchall())
        if probs:
            bad[name] = probs
        if not ("_stream" in name and name.startswith("s")):
            plan = sdf._jdf.queryExecution().executedPlan().toString()
            if "CartesianProduct" in plan:
                cartesian.append(name)
    assert not bad, f"type parity violations: {bad}"
    assert not cartesian, f"CartesianProduct planned by: {cartesian}"


def test_no_oracle_emits_negative_zero(con):
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        for row in res.fetchall():
            hit = [
                cols[i]
                for i, v in enumerate(row)
                if isinstance(v, float) and v == 0.0 and math.copysign(1, v) < 0
            ]
            if hit:
                bad[name] = hit
                break
    assert not bad, f"oracles emitting -0.0 (add `+ 0` after round): {bad}"
