"""Document chunking — split long documents into fixed-token-budget,
optionally overlapping windows (the retrieval/RAG and context-window
preprocessing primitive).

Pure scan-stage Catalyst: tokenize once, explode a start-index
``sequence``, slice+join per chunk — no shuffle, no UDF; output order
is (doc, chunk_idx) deterministic. At 100 TB chunking is embarrassingly
parallel and this plan keeps it that way: each input row expands to its
own chunks inside the same task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: "int | None" = None,
) -> DataFrame:
    """One row per chunk: ``id_col``, ``chunk_idx`` (0-based),
    ``start_token`` (0-based), ``n_tokens``, ``chunk_text``.

    Tokens are whitespace-split words. Chunks start every ``stride``
    tokens (default = ``chunk_tokens``, i.e. disjoint; smaller stride
    overlaps) and the final chunk is the possibly-short tail. Documents
    with no tokens produce no chunks.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in (0, chunk_tokens], got {stride}"
        )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # last start: the largest multiple of stride < n (tail included once)
    starts = F.sequence(
        F.lit(0),
        F.floor((F.col("__n") - 1) / stride).cast("long") * stride,
        F.lit(stride),
    )
    out = (
        base.filter(F.col("__n") > 0)
        .select(
            id_col,
            "__n",
            "__toks",
            F.posexplode(starts).alias("chunk_idx", "start_token"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.col("start_token").cast("long").alias("start_token"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("start_token")
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(
                    "__toks", F.col("start_token").cast("int") + 1, chunk_tokens
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    return out
