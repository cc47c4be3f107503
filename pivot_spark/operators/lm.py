"""Corpus-level unigram language-model scoring — the cheap, fully
distributed stand-in for the KenLM perplexity filter used by CCNet /
RefinedWeb-style pipelines (Wenzek et al. 2020 train an n-gram LM and
drop high-perplexity documents; a unigram LM is the degenerate case
that needs no external model artifact).

Plan shape (two passes over the exploded tokens, both skew-free):

1. **Vocabulary**: token -> occurrence count (one hash agg with
   map-side combine), then a bounded distributed top-V selection
   (``orderBy(...).limit(V)`` compiles to TakeOrdered — per-partition
   heaps, never a global sort) with the deterministic tie-break
   (count desc, token asc). V bounds driver/broadcast state no matter
   how many distinct tokens the corpus has.
2. **Scoring**: tokens LEFT-join the broadcast vocabulary (hot tokens
   are replicated to every task — no shuffle skew by construction);
   out-of-vocabulary tokens get the floor probability 1/N. Per-doc
   mean of -ln(p) is one hash agg keyed by doc id.

Score semantics: avg_neg_logp = (1/n_d) * sum_t -ln(cnt(t)/N), with
N = total token occurrences in the corpus; OOV -> -ln(1/N). Lower is
more "typical" text; filter by thresholding, as with any LM filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pivot_spark.functions.text import tokens


def unigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 10_000,
    lowercase: bool = True,
    score_col: str = "avg_neg_logp",
) -> DataFrame:
    """One row per document: ``id_col``, ``n_tokens``, ``score_col``
    (mean negative log unigram probability, DOUBLE rounded 4)."""
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(
        F.col(id_col), F.explode(tokens(text)).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(vocab_size)
    totals = counts.agg(F.sum("cnt").alias("n_total"))

    scored = (
        toks.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                -F.log(
                    F.coalesce(F.col("cnt"), F.lit(1)).cast("double")
                    / F.col("n_total")
                )
            ).alias("__nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__nlp"), 4).alias(score_col),
    )
