"""Streaming CDC sink: merge each micro-batch into a keyed table state
via ``foreachBatch`` + ``operators.merge.upsert`` — the streaming half
of the SCD/MERGE story (change events arrive on a stream, the sink
maintains one current row per key).

``foreachBatch`` is the standard Structured Streaming escape hatch for
sinks that need a MERGE: the batch DataFrame is a normal batch frame, so
the exact batch ``upsert`` plan (broadcast delta, base never shuffled)
runs per micro-batch. Exactly-once comes from the checkpoint's batch-id
dedup plus an idempotent write.

The parquet state here is swapped by versioned subdirectories (write
``v=<batch_id>``, then repoint a marker file) because raw parquet has no
transaction log; on an ACID table format (Delta/Iceberg/Hudi) the whole
function body collapses to the format's own MERGE INTO and the marker
dance disappears — the operator exists to pin the foreachBatch plumbing
and merge semantics, which are format-independent.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


_MARKER = "_CURRENT"


def read_upsert_state(spark: SparkSession, state_path: str) -> "DataFrame | None":
    """Current merged state, or None before the first batch commits."""
    marker = os.path.join(state_path, _MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        current = fh.read().strip()
    return spark.read.parquet(os.path.join(state_path, current))


def start_upsert_sink(
    stream: DataFrame,
    state_path: str,
    keys: Sequence[str],
    checkpoint: str,
    order_col: Optional[str] = None,
    deleted_col: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query that folds every micro-batch into the
    keyed state at ``state_path`` (last-writer-wins per key, optional
    tombstone deletes — exact ``upsert`` semantics). Returns the
    StreamingQuery; read the result with ``read_upsert_state``."""
    if not stream.isStreaming:
        raise ValueError("start_upsert_sink requires a streaming DataFrame")
    keys = list(keys)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pivot_spark.operators.merge import upsert

        spark = batch_df.sparkSession
        base = read_upsert_state(spark, state_path)
        if base is None:
            cols = [c for c in batch_df.columns if c != deleted_col]
            base = spark.createDataFrame([], batch_df.select(*cols).schema)
        merged = upsert(
            base,
            batch_df,
            keys=keys,
            order_col=order_col,
            deleted_col=deleted_col,
        )
        version_dir = f"v={batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(state_path, version_dir)
        )
        # repoint AFTER the write completes; rerunning a batch (failure
        # replay) rewrites the same version dir -> idempotent
        tmp = os.path.join(state_path, _MARKER + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(version_dir)
        os.replace(tmp, os.path.join(state_path, _MARKER))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
