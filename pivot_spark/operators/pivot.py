"""The Pivot operator: group-by + transpose + aggregate, Spark-first.

Reference semantics: ``Pivot.java:59-393`` — group rows by the pivot-row
fields; route each row to the pivot cell addressed by its pivot-column
values (stringified and matched against the declared value list,
``Pivot.java:330-353``); apply every aggregate to every cell; emit one
output row per group with columns ``{v1[_v2]}_{aggAlias}``.

Spark-first design (NOT a port): the whole operator compiles to ONE
Catalyst aggregation —

    df.groupBy(*rows).agg(
        AGG(CASE WHEN pivot_col = v THEN field END) AS v_alias, ...
    )

i.e. conditional aggregation, the same rewrite Catalyst applies to simple
``GroupBy.pivot`` calls, and exactly ANSI ``FILTER (WHERE ...)``. Why this
instead of ``df.groupBy().pivot()``:

* one shuffle, map-side partial aggregation, full whole-stage codegen for
  *every* function — ``pivot()`` falls back to the non-codegen
  ``PivotFirst`` path for composite aggregates like our case-insensitive
  string min/max;
* exact control of output column naming and empty-cell identities;
* composes unchanged with two pivot columns (conjunction of equalities —
  no composite concat-key column needed) and with Structured Streaming.

The cell-routing rule "undeclared pivot value → row excluded from every
cell, group row survives" falls out for free: such rows match no CASE
condition but still contribute their group key.

Scale notes (100 TB design): the plan is scan → partial HashAggregate →
Exchange(hash by group keys) → final HashAggregate → project. Only the
group-key + referenced columns are read (column pruning reaches the
parquet scan); state per group is bounded by |cells| × |aggs| scalars
(collect_list/set excepted — documented as memory-bounded-per-group).
COUNTDISTINCT cells each add an Expand branch (Spark's standard
multi-distinct rewrite) — cost is |distinct cells|× the scan width, still
one shuffle. AQE handles skewed group keys and partition coalescing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pivot_spark.config import OnError, PivotConfig, PivotConfigError
from pivot_spark.functions.aggregates import AGGREGATES, NUMERIC_TYPES


class PivotError(RuntimeError):
    """Raised by on_error=fail-pipeline when undeclared pivot values exist.

    (The reference intends this but its ERROR_FAIL_PIPELINE constant is
    miswired to "skip-error" — PivotConfig.java:78-80; we fail properly.)
    """


@dataclass
class PivotResult:
    """Main output + optional error port (undeclared-value group keys).

    Mirrors the reference's dual-emitter finalize (``Pivot.java:198-262``):
    ``errors`` is populated only for on_error=send-to-error-port and holds
    one row per group key that contained >=1 undeclared pivot value, plus —
    matching the reference's "missing data model" diagnostics
    (``Pivot.java:330-353``, ``AggregateResult.java:56-58``) — one
    ``{col}_undeclared`` array<string> column per pivot column listing the
    distinct undeclared values seen in that group (sorted; SQL NULL is
    recorded as the string ``"null"`` like Java ``String.valueOf``).
    """

    output: DataFrame
    errors: Optional[DataFrame] = None


def _validate_against_schema(config: PivotConfig, schema: T.StructType) -> None:
    """Runtime re-validation against the actual input schema, mirroring the
    reference's prepareRun re-validate (``Pivot.java:100-111`` →
    ``PivotConfig.java:134-187``). Accumulates all errors."""
    errors: list[str] = []
    fields = {f.name: f for f in schema.fields}
    for col in config.columns:
        if col not in fields:
            errors.append(f"pivot column {col!r} not in input schema")
    for row in config.rows:
        if row not in fields:
            errors.append(f"pivot row field {row!r} not in input schema")
    for row in config.rows:
        if row in config.columns:
            errors.append(f"field {row!r} used as both pivot row and pivot column")
    for agg in config.aggs:
        if agg.field is None:
            continue
        if agg.field not in fields:
            errors.append(f"aggregate {agg.alias!r}: field {agg.field!r} not in input schema")
            continue
        builder = AGGREGATES[agg.func]
        ftype = fields[agg.field].dataType
        if builder.requires_numeric and not isinstance(ftype, NUMERIC_TYPES):
            # Reference: numeric aggregates reject non-numeric and
            # logical-typed fields (AggregationUtils.java:36-39).
            errors.append(
                f"aggregate {agg.alias!r}: {agg.func} requires a numeric field, "
                f"{agg.field!r} is {ftype.simpleString()}"
            )
        if agg.func in ("LONGESTSTRING", "SHORTESTSTRING") and not isinstance(
            ftype, T.StringType
        ):
            errors.append(
                f"aggregate {agg.alias!r}: {agg.func} requires a string field, "
                f"{agg.field!r} is {ftype.simpleString()}"
            )
        if agg.func in ("LOGICALAND", "LOGICALOR") and not isinstance(
            ftype, T.BooleanType
        ):
            errors.append(
                f"aggregate {agg.alias!r}: {agg.func} requires a boolean field, "
                f"{agg.field!r} is {ftype.simpleString()}"
            )
    if config.order_by:
        for key in config.order_by:
            if key not in fields:
                errors.append(f"order_by key {key!r} not in input schema")
    if errors:
        raise PivotConfigError(errors)


def output_schema(config: PivotConfig, input_schema: T.StructType) -> T.StructType:
    """Design-time output schema, computed before any data is read —
    mirror of ``Pivot.generateOutputSchema`` (``Pivot.java:274-299``).

    Group-key fields keep their input type/nullability *in declared order*
    (divergence from the reference's hash-ordered HashSet,
    ``PivotConfig.java:189-192`` — SURVEY.md §2.1); every generated
    aggregate column is nullable (``Pivot.java:292``) because a pivot cell
    may receive no rows. Generated columns are ordered aggregates-outer /
    value-products-inner like the reference (``Pivot.java:283-297``).
    """
    _validate_against_schema(config, input_schema)
    fields = {f.name: f for f in input_schema.fields}
    out = [fields[r] for r in config.rows]
    for values, agg, gen_name in config.cells():
        builder = AGGREGATES[agg.func]
        in_type = fields[agg.field].dataType if agg.field else None
        name = config.aliases.get(gen_name, gen_name)
        out.append(T.StructField(name, builder.output_type(in_type), True))
    return T.StructType(out)


def _cell_condition(config: PivotConfig, values: tuple[str, ...]) -> Column:
    """Row ∈ cell(values): conjunction over the (≤2) pivot columns.

    Comparison is string-typed like the reference's ``String.valueOf(value)``
    match against the declared list (``Pivot.java:337``)."""
    cond = None
    for col_name, v in zip(config.columns.keys(), values):
        c = F.col(col_name).cast("string") == F.lit(v)
        cond = c if cond is None else (cond & c)
    return cond


def _bad_value_condition(config: PivotConfig) -> Column:
    """Row has >=1 pivot-column value outside the declared list (null
    included — it can never match a declared string)."""
    cond = None
    for col_name, vals in config.columns.items():
        c = ~F.col(col_name).cast("string").isin(list(vals)) | F.col(col_name).isNull()
        cond = c if cond is None else (cond | c)
    return cond


def build_agg_exprs(config: PivotConfig, schema: T.StructType) -> list[Column]:
    """The full cell × aggregate expression list — shared by the batch and
    streaming pivot paths."""
    fields = {f.name: f for f in schema.fields}
    order_cols = [F.col(k) for k in config.order_by] if config.order_by else None
    exprs: list[Column] = []
    for values, agg, gen_name in config.cells():
        cond = _cell_condition(config, values)
        builder = AGGREGATES[agg.func]
        col = F.col(agg.field) if agg.field else None
        in_type = fields[agg.field].dataType if agg.field else None
        name = config.aliases.get(gen_name, gen_name)
        expr = builder.build(cond, col, order_cols, in_type)
        # default fill: nulls (cells with no contributing rows, or
        # null-valued results) replaced by default_value cast to the
        # column type (Pivot.java:229-235).
        if config.default_value is not None and not builder.non_null_identity:
            out_t = builder.output_type(in_type)
            expr = F.coalesce(expr, F.lit(config.default_value).cast(out_t))
        exprs.append(expr.alias(name))
    return exprs


def pivot(df: DataFrame, config: PivotConfig) -> PivotResult:
    """Apply the pivot transformation. Returns PivotResult(output, errors).

    Runtime path equivalence with the reference (SURVEY.md §3): Spark's
    partial HashAggregate / Exchange / final HashAggregate ARE the
    reference's mergeValues / shuffle / mergePartitions steps
    (``Pivot.java:146-196``) — we write none of it.
    """
    _validate_against_schema(config, df.schema)

    # numPartitions (Pivot.java:100-105): explicit shuffle width for the
    # aggregation. Pre-partitioning by the group keys makes the exchange
    # happen here with the requested width; unset → AQE decides (better).
    if config.num_partitions is not None:
        df = df.repartition(config.num_partitions, *config.rows)

    out = df.groupBy(*config.rows).agg(*build_agg_exprs(config, df.schema))

    if config.error_mode is OnError.SKIP:
        return PivotResult(out, None)

    bad = _bad_value_condition(config)
    if config.error_mode is OnError.FAIL:
        # Correct fail-pipeline (reference bug: silently drops groups).
        # One extra job, but the predicate pushes down to the parquet scan
        # and short-circuits via limit(1).
        if df.filter(bad).limit(1).count() > 0:
            raise PivotError(
                "input contains pivot-column values outside the declared list "
                f"(pivot_columns={ {k: v for k, v in config.columns.items()} })"
            )
        return PivotResult(out, None)

    # send-to-error-port (Pivot.java:206-211, 241-262): groups containing
    # any undeclared value are suppressed from the main output and their
    # keys emitted on the error port, with the per-column distinct
    # undeclared values ("missing data model", Pivot.java:330-353) as
    # diagnostics. Bad-key set is small → broadcast anti-join (no extra
    # shuffle of the aggregated output).
    undeclared = [
        F.sort_array(
            F.collect_set(
                F.when(
                    ~F.col(c).cast("string").isin(list(vals)) | F.col(c).isNull(),
                    F.coalesce(F.col(c).cast("string"), F.lit("null")),
                )
            )
        ).alias(f"{c}_undeclared")
        for c, vals in config.columns.items()
    ]
    bad_keys = df.filter(bad).groupBy(*config.rows).agg(*undeclared)
    main = out.join(
        F.broadcast(bad_keys.select(*config.rows)), on=config.rows, how="left_anti"
    )
    return PivotResult(main, bad_keys)


def lineage(config: PivotConfig) -> dict[str, list[str]]:
    """Field-level lineage {output_field: [input_fields]} — the mapping
    the reference emits as a ``FieldTransformOperation``
    (``Pivot.java:301-328``): group-key fields map identity; every
    generated cell column derives from the pivot columns (they select
    the cell) plus the aggregated source field (none for count(*))."""
    out: dict[str, list[str]] = {r: [r] for r in config.rows}
    pivot_cols = list(config.columns)
    for values, gen_name in config.cell_names():
        name = config.aliases.get(gen_name, gen_name)
        # gen_name = "{v1[_v2]}_{aggAlias}"; strip the value prefix rather
        # than rsplit — agg aliases may themselves contain underscores
        agg_alias = gen_name[len("_".join(values)) + 1 :]
        agg = next(a for a in config.aggs if a.alias == agg_alias)
        out[name] = pivot_cols + ([agg.field] if agg.field else [])
    return out
