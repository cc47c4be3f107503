"""Reciprocal Rank Fusion — merge ranked retrieval lists from
heterogeneous retrievers (public method: Cormack, Clarke &
Buettcher, SIGIR 2009):

    RRF(q, d) = Σ_r 1 / (K + rank_r(q, d))        (K = 60 canonically)

score scales never need calibrating (only ranks enter), which is why
RRF is the default fusion for hybrid sparse+dense retrieval stacks.

Spark shape: each input is a (query_id, doc_id, rank) frame that is
already top-k-bounded (≤ queries × k rows — retriever outputs, not
corpora), so fusion is a union + one hash aggregate + one per-query
window over ≤ queries × k × n_retrievers rows. Nothing here touches
corpus-sized data; the heavy lifting stays in the retrievers (bm25
inverted-index path, cosine scan-once top-k), each with its own 100 TB
story.

No counterpart in the reference; north-star scope (SURVEY.md §2.4 E84).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: Sequence[DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    top_k: "int | None" = None,
) -> DataFrame:
    """Fuse ranked lists into (query_id, doc_id, rrf_score DOUBLE
    rounded 6, n_lists INT, rank INT). A document absent from a list
    contributes nothing for it (standard RRF). Ties break toward the
    smaller doc id; ``top_k`` truncates per query."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    parts = [
        df.select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__d"),
            F.col(rank_col).cast("double").alias("__r"),
        )
        for df in ranked
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("__q", "__d").agg(
        # 6 decimals: adjacent RRF scores differ in the 4th-5th decimal
        F.round(F.sum(1.0 / (F.lit(float(rrf_k)) + F.col("__r"))), 6).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.partitionBy("__q").orderBy(F.col("rrf_score").desc(), F.col("__d"))
    out = fused.withColumn("rank", F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.select(
        F.col("__q").alias(query_id_col),
        F.col("__d").alias(id_col),
        "rrf_score",
        "n_lists",
        "rank",
    )
