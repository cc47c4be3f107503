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
) -> DataFrame:
    """(term_a, term_b, n_ab, n_a, n_b, pmi, npmi) for every unordered
    term pair co-occurring in >= ``min_pair_count`` documents.
    ``terms_col`` is an ``array<string>``; presence is document-level
    (multiple occurrences in one doc count once). NPMI is in [-1, 1]
    with 1 = perfect co-occurrence; pairs present in every doc where
    either term appears get PMI ~ 0 under independence baselines."""
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    n_docs = df.select(id_col).distinct().count()
    dt = df.select(
        F.col(id_col).alias("doc"), F.explode_outer(F.array_distinct(F.col(terms_col))).alias("term")
    ).filter(F.col("term").isNotNull())
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
