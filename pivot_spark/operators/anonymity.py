"""Privacy screens for training-data release: k-anonymity / l-diversity
audits over quasi-identifier columns, and differentially-private
aggregate release with deterministic per-cell noise.

The anonymity reports are the standard Sweeney / Machanavajjhala
audits a dataset goes through before rows with quasi-identifiers
(location, demographic buckets, account tiers) are shared: every
equivalence class (distinct QI combination) must be large enough
(k-anonymity) and its sensitive attribute varied enough (distinct
l-diversity) that a joiner with outside knowledge cannot single out a
person. Both are ONE groupBy shuffle on the QI key with answer-sized
output — they scale like any group-count at 100 TB.

``dp_count`` / ``dp_sum`` release noisy aggregates under the Laplace
mechanism. Noise is DETERMINISTIC per (salt, cell): a reproducible
uniform from md5 (the engine-portable ``sample.py`` idiom) through the
Laplace inverse CDF. Keying noise on the release cell is the standard
repeated-release discipline — re-running the pipeline (or re-asking
the query) returns the SAME noisy answer, so an adversary cannot
average fresh noise away; rotate ``salt`` per release epoch to draw
new noise. The privacy accounting is the caller's: epsilon composes
across releases, and the md5 draw is pseudo-random (document/keep the
salt secret as you would a DP seed).

Complements ``functions/redact.py`` (PII redaction inside free text);
these operate on the structured columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Equivalence-class audit: one row per distinct quasi-identifier
    combination with ``class_size`` and ``at_risk`` (size < k — the
    classes that re-identify under a join with outside data). NULL QI
    values form their own class (a NULL bucket is still a bucket to a
    joiner). One groupBy shuffle, answer-sized output.

    Output: qi_cols + (class_size, at_risk)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < k)
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 - the metric's published name
) -> DataFrame:
    """Distinct l-diversity audit: per equivalence class, the number of
    distinct non-NULL sensitive values; a class with fewer than ``l``
    leaks the attribute even when k-anonymous (homogeneity attack).
    ``count_distinct`` here is per-QI-class (bounded by the sensitive
    alphabet), not corpus-global — the partial aggregation stays
    map-side. One shuffle, answer-sized output.

    Output: qi_cols + (class_size, n_sensitive, diverse)."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .withColumn("diverse", F.col("n_sensitive") >= l)
    )


def _laplace_noise(cell_key, b: float, salt: str):
    """Deterministic Laplace(b) draw keyed on (salt, cell): u is the
    48-bit md5 uniform (``weighted_sample_k``'s exact-in-a-double
    form), folded through the inverse CDF
    ``-b * sign(v) * ln(1 - 2|v|)`` with ``v = u - 0.5``."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), cell_key.cast("string"))),
        1,
        12,
    )
    u = (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(16**12))
    v = u - F.lit(0.5)
    return (
        F.lit(-float(b))
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )


def dp_count(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    salt: str = "dp",
    out_col: str = "noisy_count",
) -> DataFrame:
    """Laplace-mechanism group counts: ``count + Lap(1/epsilon)`` with
    the noise draw keyed on (salt, group) — see the module docstring
    for why per-cell determinism is the right repeated-release shape.
    Sensitivity 1 assumes each individual contributes one row per
    group; pre-aggregate to one row per (individual, group) first if
    not. One groupBy shuffle; the noise is a scalar projection on the
    answer-sized aggregate.

    Output: group_cols + ``out_col`` (DOUBLE; can be negative — do not
    clamp, clamping re-biases the release)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    agg = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    cell = F.concat_ws("\x01", *[F.col(c) for c in group_cols])
    noise = _laplace_noise(cell, 1.0 / epsilon, salt)
    return agg.select(
        *group_cols, (F.col("__n") + noise).alias(out_col)
    )


def dp_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    salt: str = "dp",
    out_col: str = "noisy_sum",
) -> DataFrame:
    """Laplace-mechanism group sums with contribution clipping: each
    value is clamped into [0, clip] at scan stage (bounding the
    sensitivity — the standard DP-SQL recipe), then
    ``sum + Lap(clip/epsilon)`` per group with cell-keyed noise. NULL
    values contribute 0. One shuffle, scalar noise projection.

    Output: group_cols + ``out_col`` (DOUBLE)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    clipped = F.least(
        F.greatest(F.coalesce(F.col(value_col).cast("double"), F.lit(0.0)),
                   F.lit(0.0)),
        F.lit(float(clip)),
    )
    agg = df.groupBy(*group_cols).agg(F.sum(clipped).alias("__s"))
    cell = F.concat_ws("\x01", *[F.col(c) for c in group_cols])
    noise = _laplace_noise(cell, float(clip) / epsilon, salt)
    return agg.select(
        *group_cols, (F.col("__s") + noise).alias(out_col)
    )


def pii_report(
    df: DataFrame,
    text_col: str,
    group_col: str,
    patterns: "Sequence[tuple[str, str]] | None" = None,
) -> DataFrame:
    """Corpus-level PII exposure audit: per group (source/shard/
    snapshot), how many documents contain each PII pattern and how
    many total hits — the release-gate dashboard that decides whether
    a feed needs ``redact_pii`` before training. Uses the SAME pattern
    list as the scrub (``functions/redact.py::PII_PATTERNS``, the
    Java-regex∩RE2 common subset), so audit and redaction can never
    disagree on what counts as PII.

    Scan-stage ``regexp_count`` per pattern + one groupBy — no UDF,
    no second pass over the text. Output: group_col + (n_docs, then
    per pattern ``{name}_docs`` / ``{name}_hits`` where name is the
    placeholder lowercased, e.g. ``email_docs``)."""
    if patterns is None:
        from pivot_spark.functions.redact import PII_PATTERNS

        patterns = PII_PATTERNS
    if not patterns:
        raise ValueError("patterns must be non-empty")
    t = F.col(text_col)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for pattern, repl in patterns:
        name = repl.strip("<>").lower()
        hits = F.regexp_count(t, F.lit(pattern))
        aggs.append(
            F.sum((hits > 0).cast("long")).alias(f"{name}_docs")
        )
        aggs.append(F.sum(hits).alias(f"{name}_hits"))
    return df.groupBy(group_col).agg(*aggs)
