"""Blocked fuzzy (edit-distance) join — the entity-resolution primitive:
match dirty strings against a clean reference set without an all-pairs
cross join.

Classic two-phase ER design (Fellegi-Sunter lineage; same shape as the
prefix-filtered set-similarity joins in ``neardup.py``):

1. **block**: candidate pairs come from an equi-join on a user-chosen
   blocking key (phonetic code, prefix, token, length bucket...).
   Blocking is a modeling decision — recall is bounded by it — so the
   keys are explicit arguments, not defaults.
2. **verify**: JVM-side ``levenshtein`` with the built-in early-exit
   threshold (returns -1 past the bound, so the DP matrix stays
   O(len * max_dist)), behind a cheap length pre-filter
   (``abs(len(a) - len(b)) > max_dist`` can never match).

Scale: cost is sum over blocks of |L_b| * |R_b| — bounded by the
blocking key's selectivity, never n². Hot blocks are ordinary join skew
(AQE skew-join splits them; ``skew.salted_join`` is the manual path).
Everything is codegen'd Catalyst — no Python in the hot path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int,
    left_block: Column,
    right_block: Column,
    dist_col: str = "dist",
) -> DataFrame:
    """All candidate pairs with edit distance <= ``max_dist``.

    Returns every left column plus every right column plus ``dist_col``
    (int). Column names must not collide (alias beforehand). Pairs whose
    blocking keys differ are NOT produced — recall is the blocking
    function's responsibility.
    """
    l = left.withColumn("__blk", left_block)
    r = right.withColumn("__blk", right_block)
    lc, rc = F.col(left_on), F.col(right_on)
    cand = l.join(r, "__blk").filter(
        F.abs(F.length(lc) - F.length(rc)) <= max_dist
    )
    d = F.levenshtein(lc, rc, max_dist)
    out = cand.withColumn(dist_col, d).filter(F.col(dist_col) >= 0)
    return out.drop("__blk")


def best_fuzzy_match(
    pairs: DataFrame,
    left_keys: Sequence[str],
    right_on: str,
    dist_col: str = "dist",
) -> DataFrame:
    """Pick each left entity's single best match: min distance, ties
    broken by the lexicographically smallest match string. One hash
    aggregate (``min_by`` over a composite struct) — no window sort."""
    left_keys = list(left_keys)
    others = [c for c in pairs.columns if c not in left_keys]
    key = F.struct(F.col(dist_col), F.col(right_on))
    return pairs.groupBy(*left_keys).agg(
        *[F.min_by(F.col(c), key).alias(c) for c in others]
    )
