"""File sources and sinks.

The reference gets I/O from separate CDAP plugins wired around the Pivot
stage — a delimited-file source and an Avro file sink in the example
pipeline (``examples/pivot_file_source_sink_example-cdap-data-pipeline
.json:46-53,116-117``, engine ``spark`` at ``:141``). Our engine maps
that surface onto Spark's native DataSource readers/writers, which bring
predicate pushdown, column pruning and partition pruning for free on the
columnar formats.

Format notes for the 100 TB case:
* parquet/orc: columnar, splittable, pushdown — the scale formats;
* csv/json: row formats, splittable only uncompressed or with splittable
  codecs; schema inference costs an extra pass — always pass ``schema``
  for production runs;
* avro: requires the ``spark-avro`` connector jar, which is not bundled
  with a stock PySpark install — gated behind a capability check.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json", "avro")


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    return fmt


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro DataSource is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return True
    except Exception:
        return False


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: "Optional[T.StructType | str]" = None,
    **options,
) -> DataFrame:
    """Read a file source. For csv, ``header`` defaults to true and
    schema inference is used only when no explicit schema is given."""
    fmt = _check_format(fmt)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", True)
        if schema is None:
            options.setdefault("inferSchema", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    **options,
) -> None:
    """Write a file sink. ``partition_by`` produces hive-style directory
    partitioning — the physical layout that makes downstream partition
    pruning work at scale."""
    fmt = _check_format(fmt)
    if fmt == "csv":
        options.setdefault("header", True)
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def run_file_pipeline(
    spark: SparkSession,
    source_path: str,
    config,
    sink_path: str,
    source_format: str = "csv",
    sink_format: str = "parquet",
    error_path: Optional[str] = None,
    schema: "Optional[T.StructType | str]" = None,
    source_options: Optional[dict] = None,
    sink_options: Optional[dict] = None,
) -> DataFrame:
    """source -> pivot -> sink, the reference's example pipeline shape
    (file source, Pivot stage, file sink). With ``error_path`` set and
    ``on_error=send-to-error-port``, invalid-pivot-value group keys are
    written there (the CDAP error-port wired to a second sink). Returns
    the pivoted DataFrame (already materialized into the sink)."""
    from pivot_spark.operators.pivot import pivot

    df = read_source(
        spark, source_path, source_format, schema=schema, **(source_options or {})
    )
    result = pivot(df, config)
    write_sink(result.output, sink_path, sink_format, **(sink_options or {}))
    if error_path is not None and result.errors is not None:
        write_sink(result.errors, error_path, sink_format)
    return result.output


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Ingest raw media/blob files via Spark's native ``binaryFile``
    source: one row per file — (path STRING, modificationTime TIMESTAMP,
    length BIGINT, content BINARY). The entry point of the multimodal
    pipeline (``operators/multimodal.py``): read image/audio/video bytes
    here, then decode/feature-extract with ``mapInPandas`` Arrow batches.

    ``glob`` filters file names (e.g. ``*.png``); ``max_bytes`` drops
    oversized files AT THE SOURCE via ``pathGlobFilter``-adjacent
    pruning (a filter on ``length`` — pushed to the file index, the
    content column is never materialized for dropped files thanks to
    lazy column pruning). At 100 TB keep payloads out of shuffles: derive
    features early, carry ``path`` as the key."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(df["length"] <= max_bytes)
    return df


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: Optional[str] = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table —
    the co-located-join layout: two tables bucketed the same way on the
    join key join WITHOUT a shuffle (verified in tests/test_plans.py and
    tests/test_bucketed.py). At 100 TB this turns every recurring
    fact⨝fact join on the bucket key from a full exchange into a local
    zip of bucket files. Bucketing requires saveAsTable (the metastore
    records the layout). Thin shim over ``sources.bucketed`` (multi-key
    layouts, spec introspection, co-bucket guards live there)."""
    w = df.write.format(fmt).mode(mode)
    if sort_col:
        w = w.bucketBy(num_buckets, bucket_col).sortBy(sort_col)
    else:
        w = w.bucketBy(num_buckets, bucket_col)
    w.saveAsTable(table)


def write_manifest(
    df: DataFrame,
    path: str,
    name: str,
    columns: "Optional[Sequence[str]]" = None,
    extra: "Optional[dict]" = None,
) -> dict:
    """Write a dataset manifest (dataset-card JSON) next to a sink: row
    count, schema, per-column profile (nulls, distinct estimate,
    numeric/string extremes — ``operators.profile.profile``), plus
    caller-supplied ``extra`` metadata. Returns the manifest dict and
    writes ``<path>`` as a single JSON file via the driver (the manifest
    is KB-sized — one profile aggregate reaches the driver, never data).

    The lakehouse hygiene layer: a sink without a manifest can't be
    audited for drift; diff two manifests to spot schema or volume
    regressions between runs."""
    import json

    from pivot_spark.operators.profile import profile

    prof_rows = profile(df, columns).collect()
    manifest = {
        "name": name,
        "n_rows": int(prof_rows[0]["n_rows"]) if prof_rows else 0,
        "schema": [
            {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in df.schema.fields
        ],
        "columns": [
            {
                "column": r["column"],
                "dtype": r["dtype"],
                "n_nulls": int(r["n_nulls"]),
                "n_distinct": int(r["n_distinct"]),
                "num_min": r["num_min"],
                "num_max": r["num_max"],
                "num_mean": r["num_mean"],
                "str_min": r["str_min"],
                "str_max": r["str_max"],
            }
            for r in prof_rows
        ],
    }
    if extra:
        manifest["extra"] = dict(extra)
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest
