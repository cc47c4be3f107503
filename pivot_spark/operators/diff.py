"""Keyed snapshot diff — the audit companion to ``merge.upsert``:
classify every key of two table versions as added / removed / changed /
unchanged and name the changed columns.

Plan: ONE full-outer shuffle join on the key (both sides hashed once;
AQE handles skew), with the per-column comparison as a scan-stage
null-safe equality (``<=>``) array expression — no second pass, no
UDFs. At 100 TB the output is typically filtered to
``status != 'unchanged'`` before collection; that filter pushes into
the join's project.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Returns (keys..., status STRING, changed_cols ARRAY<STRING> —
    empty except for 'changed'). Both inputs must share a schema; the
    non-key columns are compared null-safely."""
    keys = list(keys)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schemas differ: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    payload = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in payload],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in payload],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    changed = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in payload
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
