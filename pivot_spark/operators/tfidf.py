"""TF-IDF keyword extraction over a document corpus — the classic
content-signature step of data curation (topic bucketing, boilerplate
spotting, near-dup triage) in pure DataFrame algebra.

Plan shape (three aggregations, no UDFs):
1. explode tokens -> per-(doc, term) term frequency        [shuffle 1]
2. per-term document frequency over distinct (doc, term)   [reuses 1's
   frame; shuffle on term]
3. tf-idf = tf * ln(N / df), top-j terms per doc via the bounded
   sorted-array aggregation                                [shuffle on doc]

Scale notes: the unit of state is (doc, term) pairs — bounded by corpus
token count, never quadratic; every aggregate is partial/final with
map-side combine. The doc-frequency frame (one row per distinct term) is
the only broadcast-sized artifact and joins back to the exploded frame
on term; a hot term (stopword) fans out but the per-(doc,term) grouping
has already collapsed it to one row per document. The smooth variant
ln(N/(1+df)) is not used — we match the textbook idf and declare terms
present in every doc to have idf 0 (dropped from top lists by ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pivot_spark.functions.text import tokens


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 3,
    min_token_len: int = 2,
) -> DataFrame:
    """(id, term, tf, df_docs, tfidf, rank): the ``top`` highest-tf-idf
    terms per document; ties broken by term ascending (deterministic,
    oracle-checkable). Tokens are lowercased whitespace words of length
    >= ``min_token_len``."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda w: F.length(w) >= min_token_len,
    )
    pairs = df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("term"))
    tf = pairs.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_docs"))
    )
    item = F.struct(
        (-F.col("tfidf")).alias("__neg"),
        F.col("term"),
        F.col("tf"),
        F.col("df_docs"),
    )
    agg = scored.groupBy("__id").agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, top).alias("__top")
    )
    out = agg.select("__id", F.posexplode("__top").alias("__rank", "__it"))
    return out.select(
        F.col("__id").alias(id_col),
        F.col("__it.term").alias("term"),
        F.col("__it.tf").alias("tf"),
        F.col("__it.df_docs").alias("df_docs"),
        (-F.col("__it.__neg")).alias("tfidf"),
        (F.col("__rank") + 1).cast("int").alias("rank"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """Build a bounded inverted index: one row per term with
    ``df`` (document frequency, BIGINT), ``postings`` (sorted doc ids,
    truncated to ``max_postings``) and ``truncated`` (BOOLEAN — true for
    stop-word-grade terms whose full list was cut).

    Plan: explode to DISTINCT (term, doc) pairs — one hash agg keyed by
    the pair, skew-free because a hot term's pairs still differ by doc —
    then one groupBy(term) building the sorted, sliced posting array.
    The cap bounds per-term state at ingest time, which is what makes a
    posting-list build survive stop words at 100 TB (the full lists for
    'the' are useless anyway; df is still exact).
    """
    if max_postings <= 0:
        raise ValueError("max_postings must be positive")
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    pairs = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens(text)).alias("term"))
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.slice(
                F.array_sort(F.collect_list("doc")), 1, max_postings
            ).alias("postings"),
        )
        .withColumn("truncated", F.col("df") > F.size("postings"))
    )
