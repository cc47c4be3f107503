"""Bradley–Terry preference strengths from pairwise comparisons — the
standard analysis over RLHF/eval preference data ("which response won")
and, more generally, over any per-subject item scores that induce
head-to-head outcomes.

Two stages, deliberately split:

1. **Pair mining** (``pairwise_wins``): the corpus-sized part. Per
   (subject, item) scores are reduced with ONE hash aggregate, then a
   subject-keyed self-join emits each subject's head-to-head outcomes.
   The per-subject fan-out is |items-per-subject|² — bounded by the item
   alphabet, not the corpus — and the final (item_a, item_b) aggregate
   collapses everything to ≤ |alphabet|² rows with map-side combine.
   Win decisions use exact integer math (quantized value sums compared
   by cross-multiplication, ``s_a·n_b > s_b·n_a``) so they are
   engine/partitioning-independent; ties produce no comparison.

2. **Strength fitting** (``bradley_terry``): the alphabet-sized part.
   The MM algorithm (Hunter 2004, "MM algorithms for generalized
   Bradley-Terry models"):

       p_i  <-  W_i / Σ_{j≠i} n_ij / (p_i + p_j)

   iterated a fixed number of times from p=1, renormalized to mean 1
   each step. The pair matrix is ≤ |alphabet|² rows; it is collected
   and iterated driver-side in deterministic sorted order (the same
   bounded-state contract as k-means centroids: driver memory scales
   with the model, never the corpus). ``max_items`` guards the bound.

   ``smoothing`` adds a half-win pseudo-count in each direction of
   every observed pair (w'=w+s, n'=n+2s), keeping every strength
   strictly positive even for winless items and making the fixed-point
   well-defined on sparse comparison graphs.

Only items that appear in at least one comparison are scored (an
isolated item has no likelihood contribution). Output strengths are a
pure function of the win matrix — reproducible across engines, which is
what the DuckDB oracle for the declared query replays (same unrolled
iterations, same smoothing, same normalization).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pairwise_wins(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    value_col: str,
    quantize: int = 4,
) -> DataFrame:
    """Head-to-head win counts between items, judged per subject.

    Per (subject, item) the value is reduced to an exact pair
    (sum of round(value·10^quantize) as BIGINT, count); within each
    subject every item pair (item_a < item_b) is compared by mean value
    using integer cross-multiplication, so the outcome is exact.

    Returns one row per unordered item pair that produced at least one
    decisive outcome: (item_a, item_b, n BIGINT comparisons excluding
    ties, wins_a BIGINT, wins_b BIGINT).
    """
    scale = 10 ** quantize
    per = (
        df.filter(
            F.col(subject_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(subject_col, item_col)
        .agg(
            F.sum(
                F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("bigint")
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    a = per.select(
        F.col(subject_col).alias("__subj"),
        F.col(item_col).alias("item_a"),
        F.col("__s").alias("__sa"),
        F.col("__n").alias("__na"),
    )
    b = per.select(
        F.col(subject_col).alias("__subj"),
        F.col(item_col).alias("item_b"),
        F.col("__s").alias("__sb"),
        F.col("__n").alias("__nb"),
    )
    # subject-keyed equi-join: shuffle on the subject, per-subject
    # fan-out bounded by the item alphabet
    pairs = a.join(b, "__subj").filter(F.col("item_a") < F.col("item_b"))
    win_a = F.col("__sa") * F.col("__nb") > F.col("__sb") * F.col("__na")
    win_b = F.col("__sb") * F.col("__na") > F.col("__sa") * F.col("__nb")
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(
            F.sum(win_a.cast("bigint") + win_b.cast("bigint")).alias("n"),
            F.sum(win_a.cast("bigint")).alias("wins_a"),
            F.sum(win_b.cast("bigint")).alias("wins_b"),
        )
        .filter(F.col("n") > 0)
    )


def bradley_terry(
    pairs: DataFrame,
    item_a: str = "item_a",
    item_b: str = "item_b",
    wins_a: str = "wins_a",
    wins_b: str = "wins_b",
    iterations: int = 25,
    smoothing: float = 0.5,
    max_items: int = 2048,
    strength_col: str = "strength",
) -> DataFrame:
    """Fit Bradley–Terry strengths from an unordered pair-wins frame.

    The pair frame is aggregated to ≤ |alphabet|² rows, collected, and
    iterated driver-side (Hunter-2004 MM, fixed ``iterations``,
    renormalized to mean 1 each step) — the bounded-model-state
    pattern; ``max_items`` raises rather than silently collecting an
    unbounded alphabet. Returns (item, n_comparisons BIGINT,
    wins DOUBLE smoothed, ``strength_col`` DOUBLE).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    agg = (
        pairs.groupBy(item_a, item_b)
        .agg(
            F.sum(F.col(wins_a)).alias("__wa"),
            F.sum(F.col(wins_b)).alias("__wb"),
        )
        .collect()
    )
    spark = pairs.sparkSession
    items: set = set()
    for r in agg:
        items.add(r[item_a])
        items.add(r[item_b])
    if len(items) > max_items:
        raise ValueError(
            f"bradley_terry: {len(items)} items exceeds max_items="
            f"{max_items}; the MM step collects the |alphabet|^2 pair "
            "matrix to the driver — raise max_items only if that bound "
            "is acceptable"
        )
    order = sorted(items, key=lambda x: (x is None, x))
    idx = {it: i for i, it in enumerate(order)}
    # directed edges in deterministic order: (i -> j, wins of i over j)
    wins: dict = {}
    nij: dict = {}
    comparisons = {it: 0 for it in order}
    for r in sorted(agg, key=lambda r: (idx[r[item_a]], idx[r[item_b]])):
        ia, ib = idx[r[item_a]], idx[r[item_b]]
        wa = float(r["__wa"]) + smoothing
        wb = float(r["__wb"]) + smoothing
        n_raw = int(r["__wa"]) + int(r["__wb"])
        comparisons[r[item_a]] += n_raw
        comparisons[r[item_b]] += n_raw
        wins[ia] = wins.get(ia, 0.0) + wa
        wins[ib] = wins.get(ib, 0.0) + wb
        nij[(ia, ib)] = nij.get((ia, ib), 0.0) + wa + wb
        nij[(ib, ia)] = nij.get((ib, ia), 0.0) + wa + wb
    k = len(order)
    neigh: list = [[] for _ in range(k)]
    for (i, j), n in sorted(nij.items()):
        neigh[i].append((j, n))
    p = [1.0] * k
    for _ in range(iterations):
        q = []
        for i in range(k):
            denom = 0.0
            for j, n in neigh[i]:
                denom += n / (p[i] + p[j])
            q.append(wins.get(i, 0.0) / denom if denom > 0 else 0.0)
        mean = sum(q) / k
        p = [v / mean for v in q]
    schema = T.StructType(
        [
            T.StructField("item", pairs.schema[item_a].dataType),
            T.StructField("n_comparisons", T.LongType()),
            T.StructField("wins", T.DoubleType()),
            T.StructField(strength_col, T.DoubleType()),
        ]
    )
    rows = [
        (it, comparisons[it], wins.get(idx[it], 0.0), p[idx[it]])
        for it in order
    ]
    return spark.createDataFrame(rows, schema)


def bradley_terry_from_scores(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    value_col: str,
    iterations: int = 25,
    smoothing: float = 0.5,
    quantize: int = 4,
    max_items: int = 2048,
) -> DataFrame:
    """``pairwise_wins`` |> ``bradley_terry`` in one call."""
    pw = pairwise_wins(df, subject_col, item_col, value_col, quantize)
    return bradley_terry(
        pw, iterations=iterations, smoothing=smoothing, max_items=max_items
    )
