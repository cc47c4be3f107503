"""Keyed upsert (MERGE / SCD type-1) without a table format — the
engine-level primitive under Delta/Iceberg ``MERGE INTO``: apply a
batch of keyed updates (and optional deletes) onto a base snapshot,
last writer wins.

Plan shape is chosen for the overwhelmingly common CDC geometry — a
HUGE base and a small delta:

* the base table is NEVER shuffled: survivors = base LEFT ANTI join
  the delta's key set (broadcast by default, so the anti-join is a
  scan-stage hash probe), then the delta rows are unioned on top;
* intra-delta conflicts (several updates for one key) are resolved
  before the join by a deterministic ``max_by(struct(...), order)``
  hash agg over the delta only — cost scales with the delta, not the
  base.

For delta sets too big to broadcast, pass ``broadcast_delta=False``:
the anti-join becomes a shuffle join and AQE picks the strategy.

Deletes are tombstones: rows where ``deleted_col`` is true remove the
key from the result and are not re-inserted.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    order_col: Optional[str] = None,
    deleted_col: Optional[str] = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """Last-writer-wins merge of ``delta`` onto ``base``; both must
    share the base schema (plus optional ``deleted_col`` on the delta).

    ``order_col`` resolves multiple delta rows per key (max wins; ties
    break by the lexicographically greatest remaining struct — supply a
    unique order column for full determinism). Without it the delta
    must be key-unique.
    """
    keys = list(keys)
    if order_col is not None:
        payload = [
            c for c in delta.columns if c not in keys and c != order_col
        ]
        resolved = delta.groupBy(*keys).agg(
            F.max(F.col(order_col)).alias(order_col),
            *[
                F.max_by(F.col(c), F.struct(F.col(order_col), F.col(c))).alias(c)
                for c in payload
            ],
        )
        resolved = resolved.select(*delta.columns)
    else:
        resolved = delta

    if deleted_col is not None:
        inserts = resolved.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False))
        ).drop(deleted_col)
        key_set = resolved.select(*keys).distinct()
    else:
        inserts = resolved
        key_set = resolved.select(*keys).distinct()

    if broadcast_delta:
        key_set = F.broadcast(key_set)
    survivors = base.join(key_set, keys, "left_anti")
    return survivors.unionByName(inserts.select(*base.columns))
