"""Slowly-changing-dimension type-2 history (SCD2) — build a versioned
history from a change log, and apply an incremental snapshot batch onto
an existing history.

This is the engine-level primitive under warehouse ``MERGE ... WHEN
MATCHED THEN UPDATE SET valid_to = ...`` patterns (the type-1 sibling
lives in ``operators/merge.py``). The reference engine has no
history-tracking operator; this is an engine extension for the
CDC/warehouse side of a training-data pipeline (e.g. tracking document
license or source-domain status over crawl snapshots).

Scale design (100 TB history, small delta — the CDC geometry):

* ``scd2_build`` is one shuffle: a single window partitioned by the
  business key computes change detection (``lag``) and interval close
  (``lead``) over the same sort, so Catalyst reuses one exchange + sort.
* ``scd2_apply`` NEVER shuffles the history. Closed rows pass through
  untouched; current rows LEFT-join the broadcast delta (scan-stage hash
  probe) and emit 1 row (unmatched / unchanged) or 2 rows (close + new
  version) via an exploded row-plan array; brand-new keys come from a
  broadcast anti-join of the delta against the (small, semi-join
  restricted) set of matched current keys. Cost: two scans of the
  current partition of the history, zero shuffles of it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(tracked: Sequence[str], prev: Column) -> Column:
    """True when any tracked column differs (null-safe) from the previous
    version, or there is no previous version."""
    cur = F.struct(*[F.col(c) for c in tracked])
    return prev.isNull() | ~cur.eqNullSafe(prev)


def scd2_build(
    df: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_col: str,
    tiebreak: Optional[Sequence[str]] = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Collapse a change log into SCD2 history rows.

    Consecutive rows per key (ordered by ``order_col`` then ``tiebreak``)
    with identical ``tracked`` values merge into one interval; each
    surviving row gets ``valid_from`` (its own order value), ``valid_to``
    (the next version's order value, NULL while open) and a
    ``is_current`` flag. Null-safe comparison: NULL -> NULL is "no
    change".

    One shuffle on ``keys``; both window functions share the exchange
    and sort.
    """
    keys = list(keys)
    tracked = list(tracked)
    order_exprs = [F.col(order_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    prev = F.lag(F.struct(*[F.col(c) for c in tracked])).over(w)
    changes = df.withColumn("__chg", _changed(tracked, prev)).filter(
        F.col("__chg")
    )
    # lead over the same partitioning: the filter sits between the two
    # windows but the child ordering is preserved, so no second exchange
    out = (
        changes.withColumn(valid_from, F.col(order_col))
        .withColumn(valid_to, F.lead(F.col(valid_from)).over(w))
        .withColumn(current_col, F.col(valid_to).isNull())
    )
    return out.select(*keys, *tracked, valid_from, valid_to, current_col)


def scd2_apply(
    hist: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply one snapshot batch onto an SCD2 history, broadcast-delta.

    ``delta`` carries ``keys + tracked + order_col`` with at most one row
    per key (resolve a multi-row batch first — ``merge.upsert`` shows the
    ``max_by`` pattern). For each delta row:

    * key unknown -> new open version (``valid_from`` = its order value);
    * key known, tracked unchanged OR order value <= current
      ``valid_from`` (late/duplicate data) -> history unchanged;
    * else -> current version closes at the delta's order value and a new
      open version is appended.

    The history is never shuffled or rewritten beyond the affected
    current rows; see the module docstring for the plan shape.
    """
    keys = list(keys)
    tracked = list(tracked)
    hist_cols = [*keys, *tracked, valid_from, valid_to, current_col]
    hist = hist.select(*hist_cols)
    closed = hist.filter(~F.col(current_col))
    current = hist.filter(F.col(current_col))

    d = delta.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in tracked],
        F.col(order_col).alias("__d_ord"),
    )
    joined = current.join(F.broadcast(d), keys, "left")

    d_struct = F.struct(*[F.col(f"__d_{c}") for c in tracked])
    cur_struct = F.struct(*[F.col(c) for c in tracked])
    takes_update = (
        F.col("__d_ord").isNotNull()
        & (F.col("__d_ord") > F.col(valid_from))
        & ~d_struct.eqNullSafe(cur_struct)
    )
    # row plan: unchanged -> [self]; updated -> [closed self, new version]
    self_row = F.struct(
        *[F.col(c).alias(c) for c in [*keys, *tracked]],
        F.col(valid_from).alias(valid_from),
        F.when(takes_update, F.col("__d_ord")).alias(valid_to),
        (~takes_update).alias(current_col),
    )
    new_row = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(f"__d_{c}").alias(c) for c in tracked],
        F.col("__d_ord").alias(valid_from),
        F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_col),
    )
    updated_current = joined.select(
        F.explode(
            F.when(takes_update, F.array(self_row, new_row)).otherwise(
                F.array(self_row)
            )
        ).alias("__r")
    ).select("__r.*")

    # brand-new keys: delta minus the (delta-restricted, hence small)
    # matched current keys — both joins broadcast, history not shuffled
    matched_keys = current.join(
        F.broadcast(d.select(*keys)), keys, "left_semi"
    ).select(*keys)
    inserts = (
        delta.join(F.broadcast(matched_keys), keys, "left_anti")
        .select(
            *[F.col(k) for k in keys],
            *[F.col(c) for c in tracked],
            F.col(order_col).alias(valid_from),
        )
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
        .withColumn(current_col, F.lit(True))
    )
    return closed.unionByName(updated_current).unionByName(inserts)


def scd2_lookup(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time dimension lookup — the feature-store / reporting
    join every SCD2 history exists for: each fact row joins the dim
    version that was valid AT its timestamp (``valid_from <= ts <
    valid_to``, open versions have NULL ``valid_to``). By SCD2
    construction versions per key are non-overlapping, so at most one
    version matches — no post-join dedup.

    Scale shape: a plain KEY equi-join (hash-partitioned or broadcast
    when the dim is small) with the validity predicate folded into the
    join condition — fan-out is bounded by versions-per-key, so the
    e50 bucketized range join is NOT needed here (that machinery is
    for intervals without an equi-key). Fact and dim column names must
    not collide except the keys. ``how``: 'left' keeps facts with no
    valid version (nulls), 'inner' drops them."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how}")
    keys = list(keys)
    ts = fact[ts_col]
    cond = None
    for k in keys:
        c = fact[k] == dim[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (dim[valid_from] <= ts)
        & (dim[valid_to].isNull() | (ts < dim[valid_to]))
    )
    j = fact.join(dim, cond, how)
    dim_cols = [c for c in dim.columns if c not in keys]
    return j.select(*[fact[c] for c in fact.columns], *[dim[c] for c in dim_cols])
