"""Conversion attribution — credit each conversion event to the
touch/channel events that preceded it inside a lookback window
(first-touch / last-touch / linear multi-touch).

Built on the bucketized ``range_join`` (the point-in-interval strategy
documented there): conversions become per-user intervals
``[ts - lookback, ts)``, touches are points, and the join cost scales
with touches + interval replicas + true matches — never
|touches| x |conversions|. Model math after the join is plain hash
aggregation (``min_by`` / ``max_by`` arg-picks for first/last, a
count-ratio for linear) — all codegen'd, no Python, no window sort over
the fact stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400 * 1_000_000


def attribute(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    channel_col: str,
    is_conversion: Column,
    is_touch: Column,
    lookback_us: int,
    model: str = "last",
    value_col: Optional[str] = None,
    bucket_width: Optional[int] = None,
) -> DataFrame:
    """Per-(conversion, channel) credit rows.

    Output: ``user_col``, ``conv_id`` (the conversion's ``id_col``),
    ``conv_ts_us``, ``channel``, ``credit`` (sums to 1.0 per attributed
    conversion) and, when ``value_col`` is given, ``value_credit``
    (conversion value x credit). Touches strictly before the conversion
    and at most ``lookback_us`` earlier qualify; unattributed
    conversions (no touch in window) are absent.

    ``model``: ``first`` / ``last`` (deterministic arg-pick, ties broken
    by ``id_col``) or ``linear`` (equal split across qualifying
    touches).
    """
    if model not in ("first", "last", "linear"):
        raise ValueError(f"model must be first/last/linear, got {model!r}")
    from pivot_spark.operators.range_join import range_join

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = events.filter(is_conversion).select(
        F.col(user_col),
        F.col(id_col).alias("conv_id"),
        us.alias("conv_ts_us"),
        (us - F.lit(lookback_us)).alias("__start"),
        us.alias("__end"),
        *([F.col(value_col).alias("__val")] if value_col else []),
    )
    touch = events.filter(is_touch).select(
        F.col(user_col),
        us.alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(channel_col).alias("channel"),
    )
    joined = range_join(
        touch,
        conv,
        point_col="__tts",
        start_col="__start",
        end_col="__end",
        bucket_width=bucket_width or lookback_us,
        on=[user_col],
    )

    conv_keys = [user_col, "conv_id", "conv_ts_us"]
    val = [F.first(F.col("__val")).alias("__val")] if value_col else []
    if model in ("first", "last"):
        pick = F.min_by if model == "first" else F.max_by
        out = joined.groupBy(*conv_keys).agg(
            pick(F.col("channel"), F.struct(F.col("__tts"), F.col("__tid"))).alias(
                "channel"
            ),
            *val,
        ).withColumn("credit", F.lit(1.0))
    else:
        per_channel = joined.groupBy(*conv_keys, "channel").agg(
            F.count(F.lit(1)).alias("__k"), *val
        )
        # second agg over a superset key -> AQE reuses the partitioning
        totals = per_channel.groupBy(*conv_keys).agg(
            F.sum("__k").alias("__n")
        )
        out = per_channel.join(totals, conv_keys).withColumn(
            "credit", F.col("__k") / F.col("__n")
        ).drop("__k", "__n")
    if value_col:
        out = out.withColumn(
            "value_credit", F.col("__val") * F.col("credit")
        ).drop("__val")
    return out


def markov_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    is_conversion: Column,
    tiebreak_col: str,
    steps: int = 30,
) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution — the
    order-aware complement of the rule-based ``attribute`` models:
    build a first-order journey chain START → channels → CONV/NULL,
    then credit each channel by how much total conversion probability
    DISAPPEARS when that channel is knocked out (every transition into
    it redirected to the NULL sink) — Anderl et al. 2014's removal
    effect, the standard answer to "last-touch over-credits the
    bottom of the funnel".

    Journey model: per user, events in (ts, tiebreak) order, truncated
    at the FIRST conversion (which becomes the absorbing CONV state);
    non-converting journeys absorb in NULL. Transition probabilities
    are exact count ratios. Conversion probabilities come from
    ``steps`` synchronous power-iteration steps on the (scenario ×
    state) probability frame — all scenarios (base + one per removed
    channel) advance through ONE tiny join per step, so the engine
    never touches the corpus again after the one transition-count
    aggregate. Absorbing states self-loop, so step K carries the
    cumulative absorption mass; K = 30 is exact to ~1e-9 for any chain
    whose non-absorbing mass decays geometrically (every journey chain;
    callers can raise it).

    Output: one row per channel — (channel, p_conv_base,
    p_conv_removed, removal_effect = 1 - removed/base,
    attribution_share = removal effect normalized over channels;
    NULL shares when the base chain never converts).

    Scale: ONE corpus-sized window + pair aggregate; everything after
    lives on frames bounded by |channels|² (alphabet-sized), iterated
    on the driver in sorted-edge order.

    Float determinism: the driver loop sums Python floats in sorted
    (from, to) edge order, while a SQL replay sums per step in
    whatever order its aggregate visits rows; over ``steps``
    iterations the accumulated drift is bounded by ~steps * |states| *
    ulp (≈1e-12 here) — far below the 4-decimal output rounding unless
    a probability sits within ~1e-12 of a 0.5e-4 rounding boundary,
    which the declared e223 check would surface as a one-cell diff.
    """
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    ev = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(channel_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("__u"),
            F.when(is_conversion, F.lit("CONV"))
            .otherwise(F.col(channel_col).cast("string"))
            .alias("__st"),
            F.row_number().over(w).alias("__rn"),
        )
    )
    # truncate each journey at its first conversion (inclusive)
    first_conv = ev.filter(F.col("__st") == "CONV").groupBy("__u").agg(
        F.min("__rn").alias("__fc")
    )
    trunc = ev.join(first_conv, "__u", "left").filter(
        F.col("__fc").isNull() | (F.col("__rn") <= F.col("__fc"))
    )
    w2 = Window.partitionBy("__u").orderBy("__rn")
    seq = trunc.select(
        "__u", "__st", "__rn",
        F.coalesce(F.lag("__st").over(w2), F.lit("START")).alias("__prev"),
        F.max("__rn").over(Window.partitionBy("__u")).alias("__last"),
    )
    pair_body = seq.select(F.col("__prev").alias("__from"), F.col("__st").alias("__to"))
    # terminal NULL for non-converting journeys
    tail = seq.filter(
        (F.col("__rn") == F.col("__last")) & (F.col("__st") != "CONV")
    ).select(F.col("__st").alias("__from"), F.lit("NULL").alias("__to"))
    pairs = pair_body.unionByName(tail)
    counts = pairs.groupBy("__from", "__to").agg(F.count(F.lit(1)).alias("__c"))

    # The chain is ALPHABET-bounded: |states|² transition-count rows.
    # Collect the counts and build the transition matrix, the knockout
    # scenarios AND the power iteration on the DRIVER (the k-means /
    # Bradley-Terry convention for alphabet-bounded state). The old
    # engine-side scenario construction cost three extra jobs (persist
    # fence, channel distinct, scenario-frame collect) on ~250-row
    # frames — pure scheduling overhead; the corpus itself is touched
    # exactly once, by this collect's upstream.
    spark = events.sparkSession
    crows = counts.collect()
    channels = sorted(
        {r["__from"] for r in crows} - {"START", "CONV", "NULL"}
    )
    tot: dict = {}
    for r in crows:
        tot[r["__from"]] = tot.get(r["__from"], 0) + r["__c"]
    # probabilities: the same exact-count IEEE division the engine did;
    # knockout merges (two edges redirecting onto the same NULL cell)
    # accumulate in sorted (from, to) edge order — deterministic, and
    # within ulp of the engine aggregate's order (see Float
    # determinism above)
    trans_edges = sorted((r["__from"], r["__to"], r["__c"]) for r in crows)
    by_scen: dict = {}
    for s in ["__base__"] + channels:
        acc: dict = {}
        for f, t, c in trans_edges:
            t2 = "NULL" if t == s else t
            acc[(f, t2)] = acc.get((f, t2), 0.0) + c / tot[f]
        edges = [(f, t, p) for (f, t), p in acc.items()]
        # absorbing self-loops so step K holds cumulative absorption
        edges.append(("CONV", "CONV", 1.0))
        edges.append(("NULL", "NULL", 1.0))
        by_scen[s] = edges
    base_pc = 0.0
    out_rows = []
    for s in ["__base__"] + channels:
        edges = sorted(by_scen.get(s, []))
        vec = {"START": 1.0}
        for _ in range(steps):
            nxt: dict = {}
            for f, t, p in edges:
                pv = vec.get(f)
                if pv is not None:
                    nxt[t] = nxt.get(t, 0.0) + pv * p
            vec = nxt
        pc = vec.get("CONV", 0.0)
        if s == "__base__":
            base_pc = pc
        else:
            out_rows.append((s, pc))
    res = [
        (
            c, base_pc, pc,
            (1.0 - pc / base_pc) if base_pc > 0 else None,
        )
        for c, pc in out_rows
    ]
    sre = sum(r[3] for r in res if r[3] is not None)
    final = [
        (
            c, pb, pc, re,
            (re / sre) if (re is not None and sre > 0) else None,
        )
        for (c, pb, pc, re) in res
    ]
    return spark.createDataFrame(
        final,
        "channel string, p_conv_base double, p_conv_removed double, "
        "removal_effect double, attribution_share double",
    )
