"""Count-Min Sketch — mergeable approximate per-key frequency counts
in bounded (depth x width) state (public algorithm: Cormode &
Muthukrishnan 2005).

Why at 100 TB: an exact per-key count table is distinct-key-sized —
billions of group states for a key universe you only ever probe
point-wise. A CMS is ``depth*width`` counters TOTAL, regardless of
data or key-universe size; sketches of disjoint slices merge by
counter addition, so incremental maintenance (today's sketch =
yesterday's ⊕ today's delta) never rescans history. The estimate is a
guaranteed OVER-count: est >= true, est <= true + eps*N with
eps = e/width at probability 1 - (1/2)^depth.

Everything is deterministic, engine-replayable arithmetic: counter
positions are 60-bit integers from ``md5(f"{d}:{key}")`` mod width —
the same ``'0x'||hex`` trick the Bloom filter and A-ES sampler use —
so a SQL oracle can replay the sketch bit-for-bit. The sketch itself
is a (depth, pos, cnt) DataFrame: state lives in the cluster, only
estimates ever reach the driver.

No counterpart in the reference (its only sketch-free aggregate family
is `function/*.java`); this is north-star scope (SURVEY.md §2.4 E80).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(key: Column, d: int, width: int) -> Column:
    """Row d's counter index for ``key``: 60-bit int from
    md5(d ':' key), mod width. Null keys hash as the literal 'null'."""
    k = F.coalesce(key.cast("string"), F.lit("null"))
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), k)), 1, 15), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 5
) -> DataFrame:
    """Sketch ``df[col]`` into a (d int, pos long, cnt long) frame of
    at most depth*width rows. One scan; the explode emits ``depth``
    rows per input row but they collapse in the map-side partial
    aggregate, so shuffle volume is <= depth*width rows per task."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    key = F.col(col)
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), _pos(key, d, width).alias("pos"))
                for d in range(depth)
            ]
        )
    )
    return (
        df.select(pairs.alias("__p"))
        .select(F.col("__p.d").alias("d"), F.col("__p.pos").alias("pos"))
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """⊕: counters add position-wise. merge(build(A), build(B)) ==
    build(A ∪ B) exactly (same hash family ⇒ same positions)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    width: int,
    depth: int,
    out_name: str = "cms_est",
) -> DataFrame:
    """Point-query every ``probes[col]``: est = min over d of
    counter[d][pos_d(key)], with absent counters reading 0. The sketch
    (<= depth*width rows) is explicitly broadcast; the probe frame
    keeps its partitioning and is scanned once."""
    key = F.col(col)
    exploded = probes.select(
        *probes.columns,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _pos(key, d, width).alias("pos"))
                    for d in range(depth)
                ]
            )
        ).alias("__p"),
    ).select(*probes.columns, F.col("__p.d").alias("d"), F.col("__p.pos").alias("pos"))
    joined = exploded.join(F.broadcast(sketch), ["d", "pos"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_name))
    )


def hll_overlap_matrix(
    df: DataFrame,
    group_col: str,
    member_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Pairwise audience overlap between groups via HLL sketches and
    inclusion–exclusion: |A∩B| ~= |A| + |B| - |A∪B|, with |A∪B| from a
    lossless sketch union — the standard segment-overlap / reach dedup
    analysis. One member-distinct sketch aggregate per group (bounded
    2^lg_k state each), then a group-pair self-join that unions
    SKETCHES, never member sets — the members are scanned exactly once
    no matter how many pairs are reported.

    Approximate by construction (HLL relative error ~1.04/sqrt(2^lg_k);
    intersection error compounds for small overlaps — the documented
    inclusion-exclusion caveat). Output: (group_a, group_b, n_a, n_b,
    n_union, n_overlap, jaccard) with group_a < group_b; estimates as
    BIGINT, overlap floored at 0."""
    sk = df.groupBy(F.col(group_col).alias("g")).agg(
        F.hll_sketch_agg(F.col(member_col), F.lit(lg_k)).alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    j = a.join(b, F.col("a.g") < F.col("b.g"))
    n_a = F.hll_sketch_estimate(F.col("a.sk"))
    n_b = F.hll_sketch_estimate(F.col("b.sk"))
    n_u = F.hll_sketch_estimate(F.hll_union(F.col("a.sk"), F.col("b.sk")))
    ov = F.greatest(n_a + n_b - n_u, F.lit(0))
    return j.select(
        F.col("a.g").alias("group_a"),
        F.col("b.g").alias("group_b"),
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        n_u.alias("n_union"),
        ov.alias("n_overlap"),
        (ov.cast("double") / n_u).alias("jaccard"),
    )
