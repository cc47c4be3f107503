"""Star-schema denormalization — the "one big table" export step that
feeds feature stores and training-data dumps: fold every dimension
onto the fact table in one pass.

Scale shape: each dimension is explicitly ``broadcast()`` (dims are
MB-to-GB; the fact is the 100 TB side), so the plan is a chain of
BroadcastHashJoins over a SINGLE fact scan — the fact table is never
shuffled, never sorted, and whole-stage codegen fuses the entire chain
into one stage. A dimension too big to broadcast (rare) can opt out
per-dim; AQE then picks a shuffle join for that one while the rest of
the chain stays broadcast.

Chained keys resolve naturally: a dim may join on a column introduced
by an earlier dim in the list (lineitem → orders → customer → nation →
region), exactly like the SQL join chain an analyst would write.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Dim(NamedTuple):
    """One dimension: join ``df`` with ``fact[fact_key] == df[dim_key]``.
    ``columns`` optionally prunes the dim before the join (always prune
    in production — broadcast bytes are driver+executor memory);
    ``broadcast=False`` opts this dim out of broadcasting."""

    df: DataFrame
    fact_key: str
    dim_key: str
    columns: Optional[Sequence[str]] = None
    broadcast: bool = True


def denormalize(
    fact: DataFrame, dims: Sequence[Dim], how: str = "left"
) -> DataFrame:
    """Fold ``dims`` onto ``fact`` in order; returns the wide frame.
    Duplicate output names are rejected up front (rename in ``columns``
    projections first) — a silently ambiguous wide table is the classic
    denorm footgun."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    out = fact
    seen = set(fact.columns)
    for d in dims:
        dim_df = d.df
        if d.columns is not None:
            cols = list(d.columns)
            if d.dim_key not in cols:
                cols = [d.dim_key] + cols
            dim_df = dim_df.select(*cols)
        added = [c for c in dim_df.columns if c != d.dim_key]
        dup = seen.intersection(added)
        if dup:
            raise ValueError(
                f"dimension joined on {d.dim_key!r} re-introduces columns "
                f"{sorted(dup)}; project/rename them first"
            )
        seen.update(added)
        right = F.broadcast(dim_df) if d.broadcast else dim_df
        out = out.join(
            right, on=out[d.fact_key] == dim_df[d.dim_key], how=how
        ).drop(dim_df[d.dim_key])
    return out
