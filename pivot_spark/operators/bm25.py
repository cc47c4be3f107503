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


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched BM25: top-k docs for EVERY query in ``queries``
    (query_id, terms array<string>) — the inverted-index path for
    thousands of queries, where per-query literal scoring stops scaling.

    Returns (query_id, doc_id, score, rank); only documents containing
    >= 1 query term are scored (BM25 of a no-match doc is 0).

    Plan: one explode builds the (doc, term, tf) posting lists; doc
    lengths and per-term document frequencies derive from the postings;
    the query-term table is tiny and BROADCASTS onto the postings, so
    the corpus-sized frames shuffle only on their natural keys (doc,
    term) and (query, doc). Top-k per query is a window over candidate
    docs only. Corpus stats (N, avgdl) fold in as literals.
    """
    toks = tokens(F.lower(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("__doc"), toks.alias("__toks"))
    postings = (
        base.select("__doc", F.explode("__toks").alias("__term"))
        .groupBy("__doc", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dl = base.select("__doc", F.size("__toks").alias("__dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)
    if n_docs == 0:
        raise ValueError("empty corpus")

    qterms = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(terms_col).alias("__term"),
        )
        .withColumn("__term", F.lower("__term"))
        .distinct()
    )
    # document frequency only for terms some query mentions
    df_t = (
        postings.join(F.broadcast(qterms.select("__term").distinct()), "__term")
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    matched = (
        postings.join(F.broadcast(qterms), "__term")
        .join(F.broadcast(df_t), "__term")
        .join(dl, "__doc")
    )
    tf = F.col("__tf").cast("double")
    part = idf * (
        tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.lit(avgdl)))
    )
    scored = matched.groupBy("__qid", "__doc").agg(
        F.round(F.sum(part), 4).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(F.col("score").desc(), F.col("__doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__doc").alias(id_col),
            "score",
            "rank",
        )
    )
