"""Benchmark-overlap decontamination: per-document n-gram overlap score.

The standard eval-decontamination method (public: GPT-3 appendix C,
PaLM, Llama reports): a training document is contaminated when a large
fraction of its word n-grams appear in any benchmark/eval document.
Whole-document fingerprint anti-joins (``dedup.decontaminate``) miss
partial copies; n-gram overlap catches embedded benchmark text.

Plan shape (Spark-first):

1. benchmark docs → distinct n-gram md5 set — small by construction
   (benchmarks are a few MB), so the membership join BROADCASTS; the
   corpus never shuffles by gram;
2. corpus docs → per-doc distinct gram array built scan-stage with
   ``transform(sequence(...))`` (no explode of raw text), then exploded
   to (doc_id, gram) rows only for the membership probe;
3. one groupBy(doc_id) counts matches — the only shuffle, keyed by
   doc_id, rows are (id, bool).

At 100 TB: corpus-side work is a scan + one small-keyed shuffle;
benchmark set rides the broadcast. ``k`` words per gram (13 in the
published recipes; configurable — tests/synthetic data use smaller k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pivot_spark.functions.text import tokens


def word_ngram_hashes(text: Column, k: int) -> Column:
    """Distinct md5 hashes of all ``k``-word grams (sliding, stride 1)
    of whitespace-tokenized ``text``. Documents shorter than ``k`` words
    contribute one gram of all their words; empty text → empty array.
    Gram strings come from the Arrow-batched shingler
    (``neardup.word_shingles_pd`` — one python pass per batch; the
    expression form's interpreted transform/slice/join chain measured
    ~4x slower at 5k docs), md5 stays a Catalyst expression so an oracle
    can replay it."""
    from pivot_spark.operators.neardup import word_shingles_pd

    raw = word_shingles_pd(text, k)
    # the shingler emits [""] for token-less text; normalize to []
    raw = F.when(
        (F.size(raw) == 1) & (F.element_at(raw, 1) == F.lit("")),
        F.array().cast("array<string>"),
    ).otherwise(raw)
    return F.transform(raw, lambda g: F.md5(g))


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    threshold: float = 0.8,
) -> DataFrame:
    """Per-corpus-document overlap against the benchmark gram set.

    Returns (id_col, n_grams, n_overlap, overlap_frac DOUBLE rounded 4,
    contaminated BOOLEAN = overlap_frac > threshold). Documents with no
    grams (empty text) score 0.0 / not contaminated.
    """
    bench = (
        benchmark.select(
            F.explode(word_ngram_hashes(F.col(text_col), k)).alias("gram")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    grams = corpus.select(
        F.col(id_col), F.explode_outer(word_ngram_hashes(F.col(text_col), k)).alias("gram")
    )
    # benchmark side is small by construction: force broadcast so the
    # corpus side never shuffles by gram
    probed = grams.join(F.broadcast(bench), "gram", "left")
    out = probed.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count("__hit").alias("n_overlap"),
    )
    frac = F.when(
        F.col("n_grams") > 0, F.round(F.col("n_overlap") / F.col("n_grams"), 4)
    ).otherwise(F.lit(0.0))
    return out.withColumn("overlap_frac", frac).withColumn(
        "contaminated", F.col("overlap_frac") > threshold
    )
