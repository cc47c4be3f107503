"""Term co-occurrence statistics — pointwise mutual information over
document-level co-occurrence (Church & Hanks 1990), the corpus-linguistics
staple behind collocation mining, phrase detection (word2vec-style
phrase merging uses the same score), and embedding-matrix construction
(PPMI factorization).

Plan shape (all hash aggregates + one per-doc bounded self-join):
1. per-doc DISTINCT terms                 [shuffle on (doc, term)]
2. per-term doc frequency n_t             [term-keyed agg, tiny]
3. within-doc pairs (a < b) via self-join on doc -> pair doc counts
   n_ab                                   [pair-keyed agg]
4. PMI = ln(n_ab * N / (n_a * n_b)); NPMI = PMI / -ln(n_ab / N)

Scale: the pair fan-out is per-document quadratic in *distinct* terms
per doc (vocab-bounded, like the e102 basket self-join) and collapses
map-side into at most |vocab|^2 pair states; no stage is corpus-
quadratic. Hot pairs are single aggregate states, not join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    terms_col: str,
    min_pair_count: int = 2,
    max_terms_per_doc: int = 1000,
) -> DataFrame:
    """(term_a, term_b, n_ab, n_a, n_b, pmi, npmi) for every unordered
    term pair co-occurring in >= ``min_pair_count`` documents.
    ``terms_col`` is an ``array<string>``; presence is document-level
    (multiple occurrences in one doc count once). NPMI is in [-1, 1]
    with 1 = perfect co-occurrence; pairs present in every doc where
    either term appears get PMI ~ 0 under independence baselines.

    ``max_terms_per_doc`` (default 1000) bounds the per-doc self-join
    fan-out: a 10^4-distinct-term document alone emits 10^8 pair rows,
    so without a cap one long document stalls the pair stage at corpus
    scale. Docs over the cap keep their ``max_terms_per_doc`` most
    frequent terms (ties broken by term ascending — deterministic and
    engine-replayable); docs under the cap are untouched, so corpora
    of bounded documents get the exact textbook score. ``None``
    disables the cap. Capped docs are reported via ``logging`` (logger
    ``pivot_spark.cooccur``) so the cap is never silent."""
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if max_terms_per_doc is not None and max_terms_per_doc < 2:
        raise ValueError(
            f"max_terms_per_doc must be >= 2 or None, got {max_terms_per_doc}"
        )
    n_docs = df.select(id_col).distinct().count()
    if max_terms_per_doc is None:
        dt = df.select(
            F.col(id_col).alias("doc"),
            F.explode_outer(F.array_distinct(F.col(terms_col))).alias("term"),
        ).filter(F.col("term").isNotNull())
    else:
        # hybrid plan: one column-pruned probe counts over-cap docs; on
        # the (overwhelmingly common) all-under-cap corpus the probe is
        # the ONLY extra work and the scan-stage array_distinct path
        # runs unchanged. Only actual over-cap docs pay the
        # count-and-rank top-N reduction.
        base = df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(F.col(terms_col)).alias("__ts"),
            F.col(terms_col).alias("__raw"),
        )
        n_over = base.filter(F.size("__ts") > max_terms_per_doc).count()
        if n_over == 0:
            dt = base.select(
                "doc", F.explode_outer("__ts").alias("term")
            ).filter(F.col("term").isNotNull())
        else:
            import logging

            logging.getLogger("pivot_spark.cooccur").info(
                "pmi_pairs: capping %d doc(s) to their top %d terms",
                n_over, max_terms_per_doc,
            )
            under = (
                base.filter(F.size("__ts") <= max_terms_per_doc)
                .select("doc", F.explode_outer("__ts").alias("term"))
                .filter(F.col("term").isNotNull())
            )
            # over-cap docs: keep top-N terms by (in-doc count DESC,
            # term ASC). The rank window shuffles on doc — the same key
            # the pair self-join needs, so the exchange is reused.
            from pyspark.sql import Window

            tcnt = (
                base.filter(F.size("__ts") > max_terms_per_doc)
                .select("doc", F.explode("__raw").alias("term"))
                .filter(F.col("term").isNotNull())
                .groupBy("doc", "term")
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            win = Window.partitionBy("doc").orderBy(
                F.col("__c").desc(), F.col("term")
            )
            over = (
                tcnt.withColumn("__r", F.row_number().over(win))
                .filter(F.col("__r") <= max_terms_per_doc)
                .select("doc", "term")
            )
            dt = under.unionByName(over)
    marg = dt.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        dt.alias("a")
        .join(dt.alias("b"), "doc")
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    out = (
        pairs.join(marg.withColumnsRenamed({"term": "term_a", "n": "n_a"}), "term_a")
        .join(marg.withColumnsRenamed({"term": "term_b", "n": "n_b"}), "term_b")
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.lit(float(n_docs))
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    npmi = F.when(
        F.col("n_ab") == n_docs, F.lit(1.0)
    ).otherwise(pmi / -F.log(F.col("n_ab").cast("double") / F.lit(float(n_docs))))
    return out.select(
        "term_a", "term_b", "n_ab", "n_a", "n_b",
        pmi.alias("pmi"), npmi.alias("npmi"),
    )
