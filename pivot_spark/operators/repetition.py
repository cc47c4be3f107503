"""Repetition signals — the duplicate-text quality filters used by
public web-corpus pipelines (the MassiveText/Gopher-style "fraction of
duplicate n-grams" family, Rae et al. 2021, arXiv:2112.11446): documents
dominated by a few repeated phrases are boilerplate/spam and get culled
before training.

Per document:
* ``n_words``            total whitespace tokens
* ``distinct_words``     distinct tokens
* ``dup_word_frac``      1 - distinct/total (0 for empty docs)
* ``n_bigrams``          total word 2-grams
* ``top_bigram_frac``    occurrences of the most frequent 2-gram / total
                         2-grams (0 when no bigrams)

Plan shape: explode tokens / bigrams -> per-(doc, gram) counts with
map-side combine -> per-doc metrics. The unit of state is (doc, gram)
pairs — linear in corpus tokens, never quadratic; both aggregations are
partial/final hash aggregates sharing the doc-key shuffle, and the
final three-way join is on the doc key each side is already
partitioned by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, distinct_words, dup_word_frac, n_bigrams,
    top_bigram_frac) per document; empty/one-word docs get zero
    fractions rather than nulls."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) >= 1
    )
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    n = F.size(F.col("__t"))
    bigrams = F.zip_with(
        F.slice(F.col("__t"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("__t"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    words = (
        base.select("__id", F.explode("__t").alias("w"))
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("distinct_words"),
        )
    )
    bgs = (
        base.select("__id", F.explode(bigrams).alias("g"))
        .groupBy("__id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_c"))
    )

    out = (
        base.select("__id")
        .join(words, "__id", "left")
        .join(bgs, "__id", "left")
    )
    n_words = F.coalesce(F.col("n_words"), F.lit(0))
    distinct_words = F.coalesce(F.col("distinct_words"), F.lit(0))
    n_bigrams = F.coalesce(F.col("n_bigrams"), F.lit(0))
    return out.select(
        F.col("__id").alias(id_col),
        n_words.alias("n_words"),
        distinct_words.alias("distinct_words"),
        F.when(n_words > 0, 1.0 - distinct_words / n_words)
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        n_bigrams.alias("n_bigrams"),
        F.when(n_bigrams > 0, F.col("top_c") / n_bigrams)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram token entropy — the information-diversity
    quality signal (low entropy = keyword-stuffed / boilerplate text;
    used alongside the Gopher repetition rules in public corpus
    pipelines).

    Returns (id, n_tokens, token_entropy, entropy_ratio): entropy is
    -sum(p_w * ln p_w) over the doc's token frequencies (nats, rounded
    4); entropy_ratio normalizes by the maximum ln(n_tokens) -> [0, 1]
    (0 for empty or single-token docs).

    Plan: explode -> (doc, token) counts with map-side combine ->
    per-doc entropy; state is linear in corpus tokens, both aggregates
    share the doc-keyed shuffle.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) >= 1
    )
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    tf = (
        base.select("__id", F.explode("__t").alias("w"))
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # p_w needs the doc total first: tiny (doc, n) agg joined back on the
    # doc key both sides are already partitioned by
    n_per = tf.groupBy("__id").agg(F.sum("c").alias("__n"))
    ent = (
        tf.join(n_per, "__id")
        .groupBy("__id")
        .agg(
            F.first("__n").alias("n_tokens"),
            F.round(
                -F.sum((F.col("c") / F.col("__n")) * F.log(F.col("c") / F.col("__n"))),
                4,
            ).alias("token_entropy"),
        )
    )
    out = base.select("__id").join(ent, "__id", "left")
    n = F.col("n_tokens")
    h = F.col("token_entropy")
    ratio = F.when(
        n > 1, F.round(h / F.log(n.cast("double")), 4)
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("__id").alias(id_col),
        F.coalesce(n, F.lit(0)).alias("n_tokens"),
        F.coalesce(h, F.lit(0.0)).alias("token_entropy"),
        F.coalesce(ratio, F.lit(0.0)).alias("entropy_ratio"),
    )
