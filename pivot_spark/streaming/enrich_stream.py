"""Stream-static enrichment join — the dimension-lookup stage of a
streaming ingestion pipeline (enrich each event with user/product/model
metadata as it arrives).

Structured Streaming supports joining a stream against a *static*
DataFrame without any state: the static side is (re)broadcast per
micro-batch and the join is stateless map-side work — no watermark
needed, no state store, and the stream side is never shuffled when the
static side broadcasts. That per-batch re-resolution is also the
refresh hook: point the static side at a path and newly-written
dimension files are picked up on the next batch without restarting the
query (for managed-table dims, re-reading the table each batch gives
the same effect).

At 100 TB/day stream scale the rule of thumb holds: a dimension that
fits the broadcast threshold joins for free; a bigger one should be
bucketed to the stream's key layout instead (``sources/io.py``
``write_bucketed_table``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    dim_cols: Optional[Sequence[str]] = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming frame against a static dimension on ``on``.

    ``how`` may be ``inner`` or ``left`` (left keeps un-enriched events
    — the usual choice, since dropping events on a missing dim row is a
    data-loss bug in an ingestion pipeline). ``dim_cols`` projects the
    dimension before the join (column pruning is manual here because
    the static side is re-read per micro-batch — don't ship columns you
    don't need). Non-key column collisions are rejected rather than
    silently suffixed.
    """
    if not stream.isStreaming:
        raise ValueError("enrich_stream requires a streaming left side")
    if dim.isStreaming:
        raise ValueError(
            "dim must be static — for stream-stream use interval_join_stream"
        )
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    d = dim.select(on, *dim_cols) if dim_cols is not None else dim
    clash = (set(stream.columns) & set(d.columns)) - {on}
    if clash:
        raise ValueError(f"column name collision outside the key: {sorted(clash)}")
    right = F.broadcast(d) if broadcast_dim else d
    return stream.join(right, on, how)
