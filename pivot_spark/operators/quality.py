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


# --- C4-style line-level cleaning (Raffel et al. 2020, §2.2 "we only
# retained lines that ended in a terminal punctuation mark ... removed
# any page that contained 'lorem ipsum' ... any page that contained a
# curly bracket ... only retained lines with at least 3 words, and
# discarded pages with fewer than 5 kept sentences"; the 'javascript'
# line rule is from the same list). Pure scan-stage array expressions:
# split once, filter/measure with Catalyst higher-order functions —
# zero shuffles, zero Python, line payloads never leave the row.

TERMINAL_PUNCT_RE = r'[.!?"]$'


@dataclass(frozen=True)
class C4Thresholds:
    min_words_per_line: int = 3
    min_kept_lines: int = 5


def _line_words(line: Column) -> Column:
    return F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))


def c4_line_signals(
    df: DataFrame,
    text_col: str = "text",
    thresholds: C4Thresholds = C4Thresholds(),
    clean_text_col: "str | None" = "clean_text",
) -> DataFrame:
    """Append C4 line-filter signals + the composite ``keep`` flag and
    (optionally) the cleaned text rebuilt from kept lines.

    Added columns: ``n_lines``, ``n_kept_lines`` (terminal punctuation
    AND >= min words AND no 'javascript'), ``frac_terminal_lines``,
    ``dup_line_frac`` (1 - distinct/total), ``has_lorem_ipsum``,
    ``has_brace``, ``keep`` (>= min kept lines AND no lorem ipsum AND
    no brace), and ``clean_text`` (kept lines re-joined with \\n).
    Doubles rounded to 4 places (canonical form).
    """
    th = thresholds
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    n_lines = F.size(lines)

    def _kept(l: Column) -> Column:
        return (
            l.rlike(TERMINAL_PUNCT_RE)
            & (_line_words(l) >= th.min_words_per_line)
            & ~F.lower(l).contains("javascript")
        )

    kept_lines = F.filter(lines, _kept)
    n_terminal = F.size(F.filter(lines, lambda l: l.rlike(TERMINAL_PUNCT_RE)))
    dup_frac = F.when(
        n_lines > 0,
        F.round(
            1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines, 4
        ),
    ).otherwise(F.lit(0.0))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")

    out = (
        df.withColumn("n_lines", n_lines)
        .withColumn("n_kept_lines", F.size(kept_lines))
        .withColumn(
            "frac_terminal_lines",
            F.when(n_lines > 0, F.round(n_terminal.cast("double") / n_lines, 4))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("dup_line_frac", dup_frac)
        .withColumn("has_lorem_ipsum", has_lorem)
        .withColumn("has_brace", has_brace)
        .withColumn(
            "keep",
            (F.col("n_kept_lines") >= th.min_kept_lines)
            & ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace"),
        )
    )
    if clean_text_col is not None:
        out = out.withColumn(clean_text_col, F.array_join(kept_lines, "\n"))
    return out


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 1,
    clean_text_col: str = "clean_text",
) -> DataFrame:
    """Corpus-level line deduplication — the CCNet/RefinedWeb
    boilerplate-removal pass: a line occurring in more than
    ``max_doc_freq`` DISTINCT documents (nav bars, cookie banners,
    footers) is removed from EVERY document. Returns
    (id_col, n_lines BIGINT, n_removed BIGINT, clean_text).

    Scale shape: three shuffles, all on natural keys — (doc, line-hash)
    distinct + per-hash doc-frequency count (map-side combine absorbs
    hot boilerplate lines), one equi-join of the line frame against the
    frequency table keyed by the 16-byte hash (never line text), and
    the per-doc reassembly aggregate (sort_array over struct(pos,
    line) — state bounded by doc length). Empty docs and docs losing
    every line come back via the final left join with ''."""
    if max_doc_freq < 1:
        raise ValueError(f"max_doc_freq must be >= 1, got {max_doc_freq}")
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    lf = df.select(
        F.col(id_col),
        F.posexplode(lines).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    dfreq = (
        lf.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__dfq"))
    )
    kept = lf.join(dfreq, "__h").filter(F.col("__dfq") <= max_doc_freq)
    reasm = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(clean_text_col),
    )
    base = df.select(F.col(id_col), F.size(lines).alias("n_lines"))
    return base.join(reasm, id_col, "left").select(
        id_col,
        F.col("n_lines").cast("long").alias("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col(clean_text_col), F.lit("")).alias(clean_text_col),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    min_frac: float = 0.6,
    min_docs: int = 2,
    clean_text_col: str = "clean_text",
) -> DataFrame:
    """Per-site boilerplate-line removal — the group-relative variant of
    ``line_dedup``: within each ``group_col`` (site / crawl source), a
    line occurring in >= ``min_frac`` of THAT group's documents (and in
    >= ``min_docs`` documents) is boilerplate (nav bars, subscribe
    banners, per-site footers) and is stripped from every document of
    the group. Unlike the global ``max_doc_freq`` screen, the threshold
    scales with the site's size, so a 10-doc site and a 10M-doc site
    are judged by the same share. Returns (id_col, n_lines BIGINT,
    n_removed BIGINT, clean_text).

    The share test is ``line_docs >= group_docs * min_frac`` in DOUBLE
    arithmetic (both engines evaluate the identical IEEE expression, so
    the oracle cannot drift on ties).

    Scale shape: one (group, line-hash, doc) distinct + one (group,
    line-hash) doc-frequency aggregate (map-side combine absorbs hot
    boilerplate), a broadcastable per-group doc-count join, one
    left_anti equi-join keyed by (group, 16-byte hash) — line TEXT never
    shuffles on the probe side — and the per-doc reassembly aggregate
    (state bounded by doc length)."""
    if not (0.0 < min_frac <= 1.0):
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    lf = df.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(lines).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    grp_docs = df.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("__gdocs")
    )
    dfreq = (
        lf.select(group_col, "__h", id_col)
        .distinct()
        .groupBy(group_col, "__h")
        .agg(F.count(F.lit(1)).alias("__ldocs"))
    )
    boiler = (
        dfreq.join(F.broadcast(grp_docs), group_col)
        .where(
            (F.col("__ldocs") >= int(min_docs))
            & (
                F.col("__ldocs").cast("double")
                >= F.col("__gdocs").cast("double") * float(min_frac)
            )
        )
        .select(group_col, "__h")
    )
    kept = lf.join(boiler, [group_col, "__h"], "left_anti")
    reasm = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(clean_text_col),
    )
    base = df.select(F.col(id_col), F.size(lines).alias("n_lines"))
    return base.join(reasm, id_col, "left").select(
        id_col,
        F.col("n_lines").cast("long").alias("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col(clean_text_col), F.lit("")).alias(clean_text_col),
    )
