"""Gopher-style document quality ruleset (public heuristics from Rae et
al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", §A1.1 — the standard pre-training quality filter
family, also used by MassiveText / RefinedWeb / Dolma).

Every rule is a pure Catalyst expression evaluated in the scan stage —
zero shuffles, zero Python, fully codegen'd. At 100 TB this is a single
pass over the corpus with predicate- and column-pruned parquet reads;
the boolean outputs make the filter decision auditable (keep the rule
columns in a manifest, filter on ``keep``).

The reference repo has no text-quality surface; this is north-star
extension scope (SURVEY.md §2.4 E35).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pivot_spark.functions.text import tokens

# Gopher's required-word inventory (public, §A1.1): a document must
# contain at least `min_stop_hits` distinct words from this list.
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_RE = r"^\s*[-*•]"  # -, *, • line starts
ELLIPSIS_RE = r"(\.\.\.|…)\s*$"  # ... or … line ends


@dataclass(frozen=True)
class GopherThresholds:
    """Rule thresholds; defaults are the published Gopher values. Scale
    `min_words` down for short-document corpora."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_word_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stop_hits: int = 2


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    thresholds: GopherThresholds = GopherThresholds(),
) -> DataFrame:
    """Append per-rule metric + boolean columns and a composite ``keep``.

    Added columns: ``n_words``, ``mean_word_len``, ``symbol_word_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``stop_hits``, one ``rule_*`` boolean per rule, and ``keep`` (AND of
    all rules). Doubles are rounded to 4 places (canonical form).
    """
    th = thresholds
    text = F.col(text_col)
    words = tokens(text)
    n_words = F.size(words)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)

    mean_word_len = F.round(
        _frac(
            F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)),
            n_words,
        ),
        4,
    )
    # Gopher counts '#' and '…'/'...' as symbols, ratioed against words.
    n_symbols = F.regexp_count(text, F.lit(r"(#|\.\.\.|…)"))
    symbol_ratio = F.round(_frac(n_symbols, n_words), 4)
    bullet_frac = F.round(
        _frac(F.size(F.filter(lines, lambda l: l.rlike(BULLET_RE))), n_lines), 4
    )
    ellipsis_frac = F.round(
        _frac(F.size(F.filter(lines, lambda l: l.rlike(ELLIPSIS_RE))), n_lines), 4
    )
    alpha_frac = F.round(
        _frac(F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), n_words), 4
    )
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ellipsis_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("stop_hits", stop_hits)
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= th.min_words)
        & (F.col("n_words") <= th.max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= th.min_mean_word_len)
        & (F.col("mean_word_len") <= th.max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_word_ratio") <= th.max_symbol_word_ratio,
        "rule_bullet_lines": F.col("bullet_line_frac") <= th.max_bullet_line_frac,
        "rule_ellipsis_lines": F.col("ellipsis_line_frac")
        <= th.max_ellipsis_line_frac,
        "rule_alpha_words": F.col("alpha_word_frac") >= th.min_alpha_word_frac,
        "rule_stopwords": F.col("stop_hits") >= th.min_stop_hits,
    }
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: GopherThresholds = GopherThresholds(),
) -> DataFrame:
    """Rows passing every rule, original columns only."""
    return gopher_rules(df, text_col, thresholds).filter(F.col("keep")).select(df.columns)
