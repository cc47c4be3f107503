"""BM25 scored retrieval over a document corpus — pure Catalyst.

Okapi BM25 (Robertson/Spärck Jones, public) with the Lucene-style
non-negative idf: ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``.

Spark-first plan for a *single query* (a handful of terms):

1. one pass computes corpus stats ``N`` and ``avgdl`` (scalar agg);
2. one filtered agg computes per-term document frequencies — the term
   list is a literal array, so this is a scan-stage projection of
   ``size(filter(tokens, = term))`` per term, no explode, no shuffle on
   tokens;
3. scoring is a scan-stage expression per document: tf from the same
   ``size(filter(...))`` form, idf/avgdl folded in as literals via a
   broadcast of the 1-row stats frame (crossJoin broadcast — never a
   shuffle);
4. top-k by (rounded score desc, id) — bounded TakeOrderedAndProject.

At 100 TB: steps 1-2 are one full scan each (can share a cache), step 3
is the second scan, and nothing ever shuffles by token. For *batched*
query workloads (thousands of queries) the right structure is an
inverted index (explode → (term, doc) posting lists → join with the
query terms); that path reuses ``tfidf.py``'s explode machinery and is
out of scope here — BM25 term scoring itself is identical.

North-star extension scope (SURVEY.md §2.4 E36); the reference has no
retrieval surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pivot_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Returns (id_col, score DOUBLE rounded 4, rank INT). Rank is assigned
    on the *rounded* score with ``id_col`` tie-break so the ordering is
    deterministic and engine-portable (an oracle replaying the same
    formulas ranks identically).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    toks = tokens(F.lower(F.col(text_col)))
    base = docs.select(F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__dl"))

    # Corpus stats + per-term df in ONE scalar aggregation: df(t) counts
    # docs containing t, computed from a boolean per doc — partial aggs
    # keep this a single scan + single-row exchange.
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
        *[
            F.sum(F.array_contains("__toks", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"] or 0.0
    if n_docs == 0:
        raise ValueError("empty corpus")

    # idf as plan literals — Catalyst constant-folds them into the
    # scoring expression; no join needed at all.
    idf = [
        math.log(1.0 + (n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5))
        for i in range(len(terms))
    ]

    def _tf(term: str):
        # closure factory, NOT a default-arg lambda: a 2-arg lambda would
        # make F.filter pass the array index as the second argument
        return F.size(F.filter("__toks", lambda x: x == F.lit(term))).cast("double")

    score = None
    for i, t in enumerate(terms):
        tf = _tf(t)
        part = F.lit(idf[i]) * (
            tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.lit(float(avgdl or 1.0))))
        )
        score = part if score is None else score + part

    scored = base.select(id_col, F.round(score, 4).alias("score"))
    # bounded top-k: TakeOrderedAndProject, per-partition heaps of k
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
