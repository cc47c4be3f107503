"""Input-width guard for Arrow kernels (guide §2.5).

``mapInPandas``/``mapInArrow`` inherit the scan's partitioning, so a
corpus stored as one (or a few) parquet files funnels the WHOLE kernel
through a single Python worker — the single-partition trap the round-7
sf10 wall-clock caught in ``_exact_cosine_pairs_gemm`` (one Arrow
worker grinding 2e10 comparisons). The fix is the guide's input-skew
remedy ("one huge unsplittable file ... repartition immediately after
the read"): spread the rows across the session's parallelism BEFORE
the kernel.

``spread_input`` does that conditionally: an input that already
carries enough partitions (the realistic 100 TB layout) keeps its
partitioning and pays NO extra shuffle; only a scan narrower than the
session's parallelism is round-robin repartitioned. Every kernel this
guards is row-local (per-doc signatures, per-blob decodes, per-vector
assignments), so partitioning never changes the result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff it
    currently has fewer partitions; identity otherwise."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
