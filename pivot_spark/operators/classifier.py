"""Hashed-feature linear text classifier scoring — fastText-style model
inference as a pure scan-stage expression (the quality-filter family:
train a linear model offline, score every document in the corpus during
ingestion; CCNet / GPT-3 Wikipedia-vs-CommonCrawl filtering is exactly
this shape).

The model is (num_buckets weights + bias): tokens hash into buckets
(feature hashing, Weinberger et al. 2009), the document score is
``sigmoid(bias + mean of bucket weights over tokens)``. Here the weight
table is a deterministic seeded function of the bucket id (md5-derived
uniform in [-1, 1]) so the whole computation — tokenize, hash, look up,
fold, squash — is engine-portable arithmetic; a real trained model swaps
``_weight_expr`` for an ``element_at`` into a broadcast literal array,
with an identical plan shape.

Scale shape: zero shuffles and zero Python — tokenization is
``split``, the weight fold is ``F.aggregate`` over the token array, all
inside whole-stage codegen at the scan. 100 TB of documents score at
read bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(token: Column, num_buckets: int, seed: str) -> Column:
    """Feature-hash a token to [0, num_buckets): top-60-bit md5 mod n —
    replayable as ``('0x' || substring(md5(...), 1, 15))::BIGINT % n``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"fh:{seed}:"), token)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(num_buckets))


def _weight_expr(bucket: Column, seed: str) -> Column:
    """Deterministic pseudo-weight for a bucket: uniform in [-1, 1] from
    the bucket's own md5 — stands in for a trained weight table."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"w:{seed}:"), bucket.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2000001)).cast("double") / F.lit(1000000.0)) - F.lit(1.0)


def hashed_linear_score(
    df: DataFrame,
    text_col: str,
    num_buckets: int = 1024,
    seed: str = "quality",
    bias: float = 0.0,
    threshold: float = 0.5,
    out_col: str = "score",
) -> DataFrame:
    """Adds ``score`` (sigmoid of the hashed-bag-of-words linear model,
    DOUBLE; NULL for token-less text) and ``keep`` (score >= threshold,
    NULL-safe false) to ``df``. Tokens: whitespace-split, lowercased.
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    w_sum = F.aggregate(
        tokens,
        F.lit(0.0),
        lambda acc, t: acc + _weight_expr(_bucket_expr(t, num_buckets, seed), seed),
    )
    n = F.size(tokens)
    z = F.lit(bias) + w_sum / n
    score = F.when(n > 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    return df.withColumn(out_col, score).withColumn(
        "keep", F.coalesce(score >= F.lit(threshold), F.lit(False))
    )
