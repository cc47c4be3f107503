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
