"""Declarative data-quality validation — evaluate a rule suite against
a table in ONE pass and emit an auditable per-rule report (the
dbt-test / Great-Expectations pattern as an engine primitive).

All row-local rules (not-null, range, regex, accepted-values) compile
to conditional-sum columns of a single aggregate — one scan, one
single-row exchange, transposed to one row per rule with
``inline(array(struct))`` (same shape as ``profile``). Uniqueness
rules need a distinct count, which is computed in a SEPARATE tiny
aggregate per rule (mixing distincts into the shared agg triggers
Catalyst's Expand duplication — see ``profile``) and joined in via a
free 1-row cross join.

Output: (rule STRING, violations BIGINT, passed BOOLEAN) — gate a
pipeline on ``passed`` and keep the frame as the run's quality
manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One validation rule; ``kind`` in {'not_null', 'in_range',
    'matches', 'accepted_values', 'unique', 'expression'}."""

    name: str
    kind: str
    column: Optional[str] = None
    columns: Sequence[str] = field(default_factory=tuple)
    lo: Optional[float] = None
    hi: Optional[float] = None
    pattern: Optional[str] = None
    values: Sequence[str] = field(default_factory=tuple)
    expr: Optional[Column] = None


def not_null(name: str, column: str) -> Rule:
    return Rule(name, "not_null", column=column)


def in_range(name: str, column: str, lo: float, hi: float) -> Rule:
    return Rule(name, "in_range", column=column, lo=lo, hi=hi)


def matches(name: str, column: str, pattern: str) -> Rule:
    return Rule(name, "matches", column=column, pattern=pattern)


def accepted_values(name: str, column: str, values: Sequence[str]) -> Rule:
    return Rule(name, "accepted_values", column=column, values=tuple(values))


def unique(name: str, columns: Sequence[str]) -> Rule:
    return Rule(name, "unique", columns=tuple(columns))


def expression(name: str, expr: Column) -> Rule:
    """Violation = rows where ``expr`` is NOT true (null counts as a
    violation)."""
    return Rule(name, "expression", expr=expr)


def _violation_cond(r: Rule) -> Column:
    c = F.col(r.column) if r.column else None
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_range":
        return c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
    if r.kind == "matches":
        return c.isNull() | ~c.rlike(r.pattern)
    if r.kind == "accepted_values":
        return c.isNull() | ~c.isin(list(r.values))
    if r.kind == "expression":
        return ~F.coalesce(r.expr, F.lit(False))
    raise ValueError(f"unknown row-local rule kind {r.kind!r}")


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules; see module docstring for the plan shape."""
    rules = list(rules)
    if not rules:
        raise ValueError("no rules given")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")

    row_local = [r for r in rules if r.kind != "unique"]
    uniques = [r for r in rules if r.kind == "unique"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(row_local):
        aggs.append(
            F.sum(_violation_cond(r).cast("long")).alias(f"__v_{i}")
        )
    wide = df.agg(*aggs)
    for j, r in enumerate(uniques):
        cols = [F.col(c) for c in r.columns]
        # duplicate rows = total - distinct key combos (NULL keys count
        # as a combo: count over the deduplicated frame, not count(col))
        dup = df.select(*cols).groupBy(*cols).count().agg(
            (F.sum("count") - F.count(F.lit(1))).alias(f"__u_{j}")
        )
        wide = wide.crossJoin(dup)

    rows = []
    for i, r in enumerate(row_local):
        rows.append((r.name, F.col(f"__v_{i}")))
    for j, r in enumerate(uniques):
        rows.append((r.name, F.col(f"__u_{j}")))
    by_name = dict(rows)
    structs = [
        F.struct(
            F.lit(r.name).alias("rule"),
            by_name[r.name].cast("long").alias("violations"),
            (by_name[r.name] == 0).alias("passed"),
        )
        for r in rules
    ]
    return wide.select(F.inline(F.array(*structs)))


def table_checksum(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 64,
    salt: str = "ck",
) -> DataFrame:
    """Order-independent bucketed content checksum — the migration /
    parity audit: run the same checksum on two copies of a dataset
    (different engine, different partitioning, re-encoded files) and
    compare the tiny result frames; a mismatch names the bucket, so
    the diff drill-down touches 1/``n_buckets`` of the data instead of
    everything.

    Per row, a 60-bit key hash ``h = int(md5(salt:canonical_row)[:15],
    16)`` over the chosen columns (NULL encoded distinctly from the
    empty string); rows land in bucket ``h % n_buckets`` and each
    bucket reports its row count and ``sum(h)`` (exact DECIMAL(38,0)
    arithmetic — commutative, so partitioning and row order can never
    change the answer). One scan + one answer-sized exchange.

    Columns should be exact types (strings/ints/dates); canonicalize
    floats yourself first (e.g. round + cast to string) — binary float
    repr is not portable across engines. Output: (bucket, n_rows,
    checksum)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    parts: list[Column] = [F.lit(salt)]
    for c in cols:
        parts.append(F.lit("\x01"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
    h = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10).cast("long")
    return (
        df.withColumn("__h", h)
        .groupBy(F.pmod(F.col("__h"), F.lit(n_buckets)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("checksum"),
        )
    )
