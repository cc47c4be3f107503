"""Cross-corpus score calibration — make a per-document quality signal
comparable ACROSS heterogeneous sources before a single global filter
threshold is applied.

Raw quality scores are not comparable between corpora (a "good" web page
and a "good" arXiv paper live on different scales), so production
pipelines filter per-source by *quantile*, not by raw value: map every
score to its within-source quantile position, then keep the top p
fraction of EVERY source. ``quantile_normalize`` computes that map; its
output is uniform on [0, 1] within each group by construction.

Scale design: the obvious ``percent_rank() OVER (PARTITION BY source)``
window sorts each source inside a single task — with a handful of huge
sources that is the canonical 100 TB skew bottleneck. Instead the rank
comes from ONE global ``row_rank`` over (group, value, tiebreak)
(``profile.row_rank``: range partition + broadcast per-partition offsets
— a parallel prefix, no global sort, and a big source spans MANY range
partitions), and per-group offsets/counts arrive via a broadcast join of
the ≤ |groups|-row aggregate. Every division is exact-int / exact-int,
so the normalized score is engine- and partitioning-independent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    tiebreak_col: str,
    out_col: str = "q_norm",
    keep_top: "float | None" = None,
    keep_col: str = "keep",
) -> DataFrame:
    """Within-group quantile position of ``value_col``.

    Adds ``out_col`` = (rank_in_group - 1) / (n_group - 1) in [0, 1]
    (single-row groups map to 0.5), ranking by (value, tiebreak) so the
    position is a total order — deterministic under ties. Rows with a
    NULL value, tiebreak, or group key are dropped (a quantile position
    is undefined for them). With ``keep_top`` = p, also adds boolean
    ``keep_col``: the top p fraction of each group
    (``out_col`` > 1 - p) — the equal-rate-per-source filter.
    """
    if keep_top is not None and not 0.0 < keep_top <= 1.0:
        raise ValueError(f"keep_top must be in (0, 1], got {keep_top}")
    from pivot_spark.operators.profile import row_rank

    groups = list(group_cols)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(tiebreak_col).isNotNull()
    )
    for g in groups:
        base = base.filter(F.col(g).isNotNull())

    ranked = row_rank(
        base, [*groups, value_col, tiebreak_col], out_col="__grank"
    )
    per_group = ranked.groupBy(*groups).agg(
        F.min("__grank").alias("__gmin"),
        F.count(F.lit(1)).alias("__gn"),
    )
    out = (
        ranked.join(F.broadcast(per_group), groups)
        .withColumn(
            out_col,
            F.when(F.col("__gn") == 1, F.lit(0.5)).otherwise(
                (F.col("__grank") - F.col("__gmin")).cast("double")
                / (F.col("__gn") - 1).cast("double")
            ),
        )
        .drop("__grank", "__gmin", "__gn")
    )
    if keep_top is not None:
        out = out.withColumn(keep_col, F.col(out_col) > 1.0 - keep_top)
    return out
