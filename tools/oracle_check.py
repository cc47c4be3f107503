"""Self-check harness replicating the driver's correctness gate:
run every __spark_entry__.queries() entry in Spark AND its oracle_sql()
in DuckDB on the same parquet, compare row count + column names +
canonicalized values (order-insensitive).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

import __spark_entry__ as entry_mod
from pivot_spark.session import get_spark
from pivot_spark.sources.catalog import TABLES


def canon_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        r = round(v, 4)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.4f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + "|".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(cols, rows) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in queries:
        if only and name not in only:
            continue
        sdf = queries[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"{name:18s} ROWS-ONLY rows={len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name:18s} COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"{name:18s} ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            _, sc = canon_frame(scols, srows)
            _, dc = canon_frame(dcols, drows)
            if sc != dc:
                bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                print(f"{name:18s} VALUE MISMATCH ({sum(1 for a,b in zip(sc,dc) if a!=b)} rows) e.g. {bad}")
                ok = False
        if ok:
            print(f"{name:18s} OK rows={len(srows)} cols={len(scols)}")
        else:
            failed.append(name)
    if failed:
        print(f"\nFAILED: {failed}")
        return 1
    print("\nALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
