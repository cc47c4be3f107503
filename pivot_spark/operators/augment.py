"""Deterministic text augmentation — training-pair construction ops.

The reference (data-integrations/pivot) has no augmentation surface; this
is part of the LLM-training-data extension set (SURVEY.md §2.4): given a
clean corpus, emit model-ready (input, target) pairs.

``span_corruption`` is the T5 denoising objective (Raffel et al. 2020,
§3.1.4): mask contiguous token spans, replace each span with a sentinel
token in the input, and emit the spans (each prefixed by its sentinel)
as the target. Masking here is *deterministic* — a portable md5 draw per
(seed, doc, position) — so the emitted pairs are reproducible across
engines, reruns, and partitionings (the same contract every sampling op
in this repo follows; see operators/sample.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mask_rate: float = 0.15,
    seed: str = "s42",
) -> DataFrame:
    """T5-style span corruption: (input_text, target_text) per document.

    Token t at 0-based position i is masked iff the first 16 bits of
    md5('<seed>:<id>:<i>') fall below ``mask_rate`` (hex-string compare
    — engine-portable). Runs of masked tokens collapse: the k-th masked
    run (0-based, in document order) becomes ``<extra_id_k>`` in the
    input; the target is the concatenation of ``<extra_id_k>`` + the
    run's tokens. (Unlike original T5 no trailing end-sentinel is
    appended — declared divergence, the pair is self-delimiting here.)

    Plan: whitespace tokenize + posexplode, ONE doc-keyed exchange that
    both the run-labeling window and the final per-doc aggregate reuse
    (same hash partitioning — Catalyst plans a single shuffle), then
    answer-sized output. Per-doc state is bounded by document length;
    no cross-document state exists, so the operator scales linearly.
    Documents with no tokens (NULL/blank text) are excluded.

    Output: (id, n_tokens, n_masked, n_spans, input_text, target_text).
    """
    if not 0.0 < mask_rate < 1.0:
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    thr = format(int(mask_rate * 65536), "04x")

    toks = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda w: w != ""
                )
            ).alias("__pos", "__tok"),
        )
        .withColumn(
            "__msk",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col("__id").cast("string"),
                        F.col("__pos").cast("string"),
                    )
                ),
                1,
                4,
            )
            < thr,
        )
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    run = toks.withColumn(
        "__rs",
        (
            F.col("__msk")
            & ~F.coalesce(F.lag("__msk").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn(
        "__k",
        F.sum("__rs").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("__k").cast("string"), F.lit(">")
    )
    pieces = run.select(
        "__id",
        "__pos",
        F.col("__msk").cast("int").alias("__mi"),
        "__rs",
        F.when(~F.col("__msk"), F.col("__tok"))
        .when(F.col("__rs") == 1, sentinel)
        .alias("__inp"),
        F.when(
            F.col("__msk") & (F.col("__rs") == 1),
            F.concat(sentinel, F.lit(" "), F.col("__tok")),
        )
        .when(F.col("__msk"), F.col("__tok"))
        .alias("__tgt"),
    )

    def _joined(col: str):
        ordered = F.array_sort(
            F.collect_list(F.struct(F.col("__pos"), F.col(col).alias("p")))
        )
        return F.array_join(
            F.filter(
                F.transform(ordered, lambda s: s["p"]),
                lambda p: p.isNotNull(),
            ),
            " ",
        )

    return pieces.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__mi").cast("long").alias("n_masked"),
        F.sum("__rs").cast("long").alias("n_spans"),
        _joined("__inp").alias("input_text"),
        _joined("__tgt").alias("target_text"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: str = "fim42",
    pre_tok: str = "<PRE>",
    mid_tok: str = "<MID>",
    suf_tok: str = "<SUF>",
) -> DataFrame:
    """Fill-in-the-Middle transform (Bavarian et al. 2022): split each
    document at two deterministic positions into (prefix, middle,
    suffix) and emit both canonical reorderings —

    * PSM: ``<PRE> prefix <SUF> suffix <MID> middle``
    * SPM: ``<SUF> suffix <PRE> prefix <MID> middle``

    — the training pairs that teach a causal LM to infill. The split
    points are md5 draws (``'<seed>:1:'||id`` / ``'<seed>:2:'||id``)
    mapped to [0, L] by EXACT integer arithmetic — ``(v * (L+1)) >>
    32`` on the 32-bit hash value — so the same document yields the
    same pair on any engine, rerun, or partitioning (no float
    rounding at the boundary, unlike a ``floor(u * L)`` construction).
    The 32-bit draw keeps ``v * (L+1)`` inside int64 for any text up
    to 2^31 - 1 characters (a 48-bit draw would silently wrap int64
    past 32 K chars); texts longer than that are out of contract.

    Pure scan-stage: two md5 calls + three substrings per row, zero
    shuffles, zero Python. NULL ids/texts are excluded; an empty text
    yields three empty parts (sentinels only).

    Output: (id, split_lo INT, split_hi INT, prefix, middle, suffix,
    fim_psm, fim_spm).
    """
    two32 = 4294967296  # 2^32

    def draw(tag: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{tag}:"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    base = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).cast("long").alias("__L"),
        draw("1").alias("__v1"),
        draw("2").alias("__v2"),
    )
    # `div`, not `/`: Spark's `/` is DOUBLE division, and v*(L+1) can
    # exceed 2^53 where doubles drop integer precision — `div` keeps
    # the whole computation in exact 64-bit integers
    a = F.expr(f"(__v1 * (__L + 1)) div {two32}")
    b = F.expr(f"(__v2 * (__L + 1)) div {two32}")
    base = base.select(
        "id", "__t",
        F.least(a, b).cast("int").alias("split_lo"),
        F.greatest(a, b).cast("int").alias("split_hi"),
    )
    lo, hi = F.col("split_lo"), F.col("split_hi")
    prefix = F.col("__t").substr(F.lit(1), lo)
    middle = F.col("__t").substr(lo + 1, hi - lo)
    suffix = F.col("__t").substr(hi + 1, F.length("__t") - hi)
    out = base.select(
        "id", "split_lo", "split_hi",
        prefix.alias("prefix"), middle.alias("middle"), suffix.alias("suffix"),
    )
    return out.select(
        "*",
        F.concat(
            F.lit(pre_tok), "prefix", F.lit(suf_tok), "suffix",
            F.lit(mid_tok), "middle",
        ).alias("fim_psm"),
        F.concat(
            F.lit(suf_tok), "suffix", F.lit(pre_tok), "prefix",
            F.lit(mid_tok), "middle",
        ).alias("fim_spm"),
    )
