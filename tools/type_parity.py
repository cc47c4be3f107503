"""Type-parity audit: for every declared query with an oracle, the
Spark result schema must map 1:1 onto the DuckDB oracle's DESCRIBE
types.

Why this is a hard gate: the round-1..3 driver evidence isolates the
correctness hash as TYPE-AWARE — queries whose DuckDB column type
diverges from the Spark type went red with identical values (HUGEINT
vs BIGINT in e152, DECIMAL(18,4) vs DOUBLE in e104), while
value-identical queries with aligned types (nullable BIGINT in e69/e70,
DATE in e17) stayed green. So "values match under fetchall" is not
enough; the TYPES must match.

Usage: python tools/type_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def duck_canon(t: str) -> str:
    """DuckDB DESCRIBE type -> canonical tag."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{duck_canon(t[:-2])}>"
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return {
        "TINYINT": "tinyint", "SMALLINT": "smallint", "INTEGER": "int",
        "BIGINT": "bigint", "HUGEINT": "hugeint", "UTINYINT": "utinyint",
        "USMALLINT": "usmallint", "UINTEGER": "uint", "UBIGINT": "ubigint",
        "FLOAT": "float", "REAL": "float", "DOUBLE": "double",
        "VARCHAR": "string", "BOOLEAN": "boolean", "BLOB": "binary",
        "DATE": "date", "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
    }.get(t, t.lower())


def spark_canon(t: str) -> str:
    """Spark simpleString dtype -> canonical tag."""
    t = t.strip().lower()
    m = re.match(r"array<(.+)>$", t)
    if m:
        return f"array<{spark_canon(m.group(1))}>"
    m = re.match(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return {"timestamp_ntz": "timestamp", "void": "null"}.get(t, t)


def compare(spark_dtypes, duck_desc) -> list[str]:
    """Return a list of human-readable mismatches (empty = parity)."""
    sd = {c: spark_canon(t) for c, t in spark_dtypes}
    dd = {c: duck_canon(t) for c, t, *_ in duck_desc}
    out = []
    if set(sd) != set(dd):
        out.append(f"column sets differ: spark-only={sorted(set(sd)-set(dd))} "
                   f"duck-only={sorted(set(dd)-set(sd))}")
        return out
    for c in sorted(sd):
        if sd[c] != dd[c]:
            out.append(f"{c}: spark={sd[c]} duck={dd[c]}")
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from pivot_spark.session import get_spark
    from pivot_spark.sources.catalog import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("type_parity")
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
        if name not in oracles:
            continue
        sdf = queries[name](spark, sf_dir)
        desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        probs = compare(sdf.dtypes, desc)
        if probs:
            print(f"{name:18s} TYPE MISMATCH: {probs}")
            failed.append(name)
        else:
            print(f"{name:18s} OK")
    if failed:
        print(f"\nFAILED: {failed}")
        return 1
    print("\nALL TYPES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
