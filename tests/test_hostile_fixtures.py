"""Hostile-fixture oracle parity: the driver's sf fixtures are ASCII
with no NULL text, so divergences that only trigger on non-ASCII /
NULL / very long documents never reach the gate (round-4 ADVICE items
2 and 5). This suite rebuilds a tiny `documents` table containing
exactly those rows and re-runs the affected declared queries against
their own oracle SQL on it.

Covered landmines:
- e228: Spark averaged UTF-8 BYTES while the oracle averaged
  CODEPOINTS (multibyte chars also overflow the fixed payload and get
  truncated by make_png), and NULL text produced a row on one side
  only. Fixed by NULL filters + ASCII-restriction on both sides.
- e229: the old 48-bit md5 draw overflowed int64 for texts >= 32768
  chars (silent wraparound in non-ANSI Spark; out-of-range error in
  DuckDB). Fixed by a 32-bit draw.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_sf")
    rows = [
        (1, "plain ascii document body " * 8, "en", "web", 208),
        (2, "café naïve résumé " * 10, "fr", "web", 180),
        (3, "中文文档" * 30, "zh", "web", 120),
        (4, "emoji \U0001f600\U0001f680 mixed ascii tail", "en", "web", 24),
        (5, None, "en", "web", 0),
        (None, "row with null id", "en", "web", 16),
        (6, "z" * 40000, "en", "web", 40000),
        (7, "", "en", "web", 0),
    ]
    duckdb.connect().execute(
        "COPY (SELECT * FROM (VALUES "
        + ", ".join(["(?, ?, ?, ?, ?)"] * len(rows))
        + ") t(doc_id, text, lang, source, n_chars)) TO "
        f"'{d}/documents.parquet' (FORMAT PARQUET)",
        [v for r in rows for v in r],
    )
    return str(d)


@pytest.fixture(scope="module")
def hostile_con(hostile_dir):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hostile_dir}/documents.parquet')"
    )
    return c


def _canon(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        return repr(float(v))
    return str(v)


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _parity(spark, con, name, hostile_dir):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, hostile_dir)
    srows = sdf.collect()
    scols = sdf.columns
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert _rowset(srows, scols) == _rowset(orows, ocols)


def test_e228_parity_on_non_ascii_and_null_text(spark, hostile_con, hostile_dir):
    _parity(spark, hostile_con, "e228_png_decode", hostile_dir)


def test_e229_parity_on_long_and_non_ascii_text(spark, hostile_con, hostile_dir):
    _parity(spark, hostile_con, "e229_fim_transform", hostile_dir)
