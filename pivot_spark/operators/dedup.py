"""Deduplication operators for large-scale training-data pipelines.

Exact dedup here; near-dup (MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) live in ``pivot_spark/operators/neardup.py``.

Scale notes: ``dedup_exact`` with an order key compiles to ONE hash
aggregation (min over a ``(order_keys..., payload_struct)`` struct) — a
single shuffle on the dedup keys with map-side partial aggregation. That
beats the window-function formulation (row_number over partitionBy) which
must sort every partition, and it is deterministic, unlike
``dropDuplicates`` whose survivor depends on partition order.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keep one row per distinct ``keys`` combination.

    With ``order_by``: keeps the row with the smallest order key
    (deterministic). Without: Spark's ``dropDuplicates`` (arbitrary
    survivor — fine when any representative will do, cheaper to plan).
    """
    if not order_by:
        return df.dropDuplicates(list(keys))
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("__p")
    ordered = F.struct(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(order_by)], payload
    )
    agg = df.groupBy(*keys).agg(F.min(ordered).alias("__m"))
    return agg.select(*[F.col(f"__m.__p.{c}").alias(c) for c in df.columns])


def dedup_against(
    df: DataFrame,
    blocklist: DataFrame,
    on: "str | Sequence[str]",
    broadcast: bool = True,
) -> DataFrame:
    """Cross-corpus decontamination: drop rows of ``df`` whose ``on``
    key(s) appear in ``blocklist`` — the standard "remove eval-set /
    already-trained documents from the new crawl" step, keyed by any
    stable identity (normalization fingerprint, url, doc id).

    One left-anti join. ``broadcast=True`` (default) is right for the
    usual shape — a bounded blocklist (benchmarks, previous-epoch
    fingerprints) against a 100 TB corpus: the corpus is scanned once
    with NO shuffle. Set ``broadcast=False`` when the blocklist is
    itself corpus-sized (epoch-over-epoch dedup) — then it's a shuffled
    anti-join on the key, which is the correct plan at that shape (and
    AQE still converts it back to broadcast if the runtime size allows).
    """
    on = [on] if isinstance(on, str) else list(on)
    right = blocklist.select(*on).dropDuplicates(on)
    if broadcast:
        right = F.broadcast(right)
    return df.join(right, on=on, how="left_anti")


def debounce(
    df: DataFrame,
    keys: "Sequence[str]",
    ts_col: str,
    min_gap: int,
    order_tiebreak: "Optional[str]" = None,
) -> DataFrame:
    """Rate-limiting dedup ("debounce"): within each key, keep an event
    only if at least ``min_gap`` has elapsed since the LAST KEPT event
    (the first event of a burst survives, echoes/retries inside the gap
    drop — duplicate-click suppression, log flood control).

    Kept-state is sequential, so this is a per-key ordered fold:
    sort each key's events by (ts, tiebreak) and scan with a running
    last-kept timestamp — expressed as an ``aggregate()`` fold over the
    collected per-key event list (bounded by events-per-key, the same
    state bound as sessionization), ONE shuffle. A lag()-based filter
    would be wrong: lag compares to the previous EVENT, not the previous
    KEPT event, and a long burst would re-admit rows mid-burst.
    """
    keys = list(keys)
    tb = order_tiebreak or ts_col
    if tb == ts_col:
        # scalar fast path: fold plain timestamps instead of (t, o)
        # structs — same kept set, ~1.7x cheaper (higher-order folds are
        # interpreted per element; struct alloc dominates)
        grouped = df.groupBy(*keys).agg(
            F.array_sort(F.collect_list(ts_col)).alias("__evs")
        )
        kept = F.aggregate(
            F.col("__evs"),
            F.array().cast(grouped.schema["__evs"].dataType),
            lambda acc, t: F.when(
                (F.size(acc) == 0)
                | ((t - F.element_at(acc, -1)) >= F.lit(min_gap)),
                F.concat(acc, F.array(t)),
            ).otherwise(acc),
        )
        return grouped.select(*keys, F.explode(kept).alias(ts_col))
    ev = F.struct(F.col(ts_col).alias("t"), F.col(tb).alias("o"))
    grouped = df.groupBy(*keys).agg(
        F.array_sort(F.collect_list(ev)).alias("__evs")
    )
    # fold: acc = array of kept (t, o) structs; keep when first event or
    # t - last_kept >= min_gap
    kept = F.aggregate(
        F.col("__evs"),
        F.array().cast(grouped.schema["__evs"].dataType),
        lambda acc, e: F.when(
            (F.size(acc) == 0)
            | ((e["t"] - F.element_at(acc, -1)["t"]) >= F.lit(min_gap)),
            F.concat(acc, F.array(e)),
        ).otherwise(acc),
    )
    out = grouped.select(*keys, F.explode(kept).alias("__k"))
    cols = [F.col("__k.t").alias(ts_col)]
    if tb != ts_col:
        cols.append(F.col("__k.o").alias(tb))
    return out.select(*keys, *cols)
