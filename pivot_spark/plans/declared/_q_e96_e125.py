"""Declared queries e96-e125: split from the original single-module
registry; the package __init__ imports the parts in sequence so
QUERIES/ORACLES keep their registration order."""

from __future__ import annotations

from ._base import (F, _mined_pairs, _read, _read_spread, query, serialize_arrays)  # noqa: F401
from ._q_p01_e28 import (_sample_threshold)  # noqa: F401
from ._q_e29_e62 import (_E31_ORACLE)  # noqa: F401



# --- E96: star-schema denormalization ("one big table"): the full
# TPC-H dim chain (orders -> customer -> nation -> region, plus part
# and supplier) folded onto lineitem as explicit broadcast joins — ONE
# fact scan, zero fact shuffles until the final summary aggregate.
# Summarized per (region, order status) so the declared output stays
# bounded; the oracle is the plain SQL join chain.
_E96_ORACLE = """
SELECT r.r_name, o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l.l_extendedprice), 4) AS revenue,
       CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_part_types,
       CAST(count(DISTINCT s.s_name) AS BIGINT) AS n_suppliers
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN part p ON l.l_partkey = p.p_partkey
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


@query("e96_denormalize", _E96_ORACLE)
def e96_denormalize(spark, sf_dir):
    from pivot_spark.operators.denorm import Dim, denormalize

    li = _read(spark, sf_dir, "lineitem")
    wide = denormalize(
        li,
        [
            Dim(_read(spark, sf_dir, "orders"), "l_orderkey", "o_orderkey",
                columns=["o_custkey", "o_orderstatus"]),
            Dim(_read(spark, sf_dir, "customer"), "o_custkey", "c_custkey",
                columns=["c_nationkey"]),
            Dim(_read(spark, sf_dir, "nation"), "c_nationkey", "n_nationkey",
                columns=["n_regionkey"]),
            Dim(_read(spark, sf_dir, "region"), "n_regionkey", "r_regionkey",
                columns=["r_name"]),
            Dim(_read(spark, sf_dir, "part"), "l_partkey", "p_partkey",
                columns=["p_type"]),
            Dim(_read(spark, sf_dir, "supplier"), "l_suppkey", "s_suppkey",
                columns=["s_name"]),
        ],
    )
    return wide.groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        F.count_distinct("p_type").alias("n_part_types"),
        F.count_distinct("s_name").alias("n_suppliers"),
    )


# --- E97: per-group winsorized/trimmed means — the robust summary for
# heavy-tailed value columns; same broadcast-quantile shape as e78
# (fact never shuffled for the quantile pass). Exact percentiles
# (quantile_cont parity); boundary membership compares the same
# interpolated doubles on both engines.
_E97_ORACLE = """
WITH q AS (
  SELECT event_type, quantile_cont(value, 0.05) AS qlo, quantile_cont(value, 0.95) AS qhi
  FROM events WHERE value IS NOT NULL GROUP BY 1
), j AS (
  SELECT e.event_type, e.value AS x, q.qlo, q.qhi
  FROM events e JOIN q USING (event_type) WHERE e.value IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 4) AS mean,
       round(avg(least(greatest(x, qlo), qhi)), 4) AS winsorized_mean,
       round(avg(CASE WHEN x BETWEEN qlo AND qhi THEN x END), 4) AS trimmed_mean
FROM j GROUP BY 1
"""


@query("e97_winsorized", _E97_ORACLE)
def e97_winsorized(spark, sf_dir):
    from pivot_spark.operators.outliers import winsorized_stats

    ev = _read(spark, sf_dir, "events")
    return winsorized_stats(ev, ["event_type"], "value", lo=0.05, hi=0.95)


# --- E98: chi-square independence test + Cramer's V from ONE
# contingency aggregate (zero-cell mass added in closed form: Σ over
# observed (o-e)^2/e + (n - Σ_obs e)). Cell-for-cell oracle replay.
_E98_ORACLE = """
WITH joint AS (
  SELECT event_type AS x, user_id % 10 AS y, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), cells AS (
  SELECT x, y, c,
         sum(c) OVER (PARTITION BY x) AS cx,
         sum(c) OVER (PARTITION BY y) AS cy,
         sum(c) OVER () AS n
  FROM joint
), a AS (
  SELECT max(n) AS n,
         count(DISTINCT x) AS r, count(DISTINCT y) AS k,
         sum((c::DOUBLE - cx::DOUBLE * cy / n) * (c::DOUBLE - cx::DOUBLE * cy / n)
             / (cx::DOUBLE * cy / n)) AS chi_obs,
         sum(cx::DOUBLE * cy / n) AS e_obs
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((r - 1) * (k - 1) AS BIGINT) AS dof,
       round(chi_obs + (n::DOUBLE - e_obs), 4) AS chi2,
       round(CASE WHEN n > 0 AND least(r - 1, k - 1) > 0
             THEN sqrt((chi_obs + (n::DOUBLE - e_obs))
                       / (n::DOUBLE * least(r - 1, k - 1))) END, 4) AS cramers_v
FROM a
"""


@query("e98_chi_square", _E98_ORACLE)
def e98_chi_square(spark, sf_dir):
    from pivot_spark.operators.analytics import chi_square

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return chi_square(ev, "event_type", "user_bucket")


# --- E99: PSI distribution drift between two deterministic snapshot
# halves (md5 hash split — the e25 machinery): per-bucket shares,
# eps-floored log ratio. The ML-ops drift alarm, replayed exactly.
_E99_ORACLE = """
WITH tagged AS (
  SELECT CAST(floor(value / 10.0) AS INTEGER) AS b,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), ca AS (
  SELECT b, count(*) AS na FROM tagged WHERE in_a GROUP BY 1
), cb AS (
  SELECT b, count(*) AS nb FROM tagged WHERE NOT in_a GROUP BY 1
), both_t AS (
  SELECT coalesce(ca.na, 0) AS na, coalesce(cb.nb, 0) AS nb
  FROM ca FULL JOIN cb USING (b)
), tot AS (
  SELECT sum(na) AS n_a, sum(nb) AS n_b, count(*) AS n_buckets FROM both_t
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       round(sum((greatest(na::DOUBLE / n_a, 0.000001) - greatest(nb::DOUBLE / n_b, 0.000001))
                 * ln(greatest(na::DOUBLE / n_a, 0.000001) / greatest(nb::DOUBLE / n_b, 0.000001))), 4) AS psi
FROM both_t, tot
GROUP BY n_a, n_b, n_buckets
"""


@query("e99_psi_drift", _E99_ORACLE)
def e99_psi_drift(spark, sf_dir):
    from pivot_spark.operators.analytics import psi_drift

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.floor(F.col("value") / 10.0).cast("int")
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(bucket.alias("b"), in_a.alias("in_a"))
    return psi_drift(
        tagged.filter("in_a").select("b"),
        tagged.filter("NOT in_a").select("b"),
        "b",
        eps=1e-6,
    )


# --- E100: two-sample Kolmogorov-Smirnov drift test over the same
# md5-split halves as e99 — the ECDF is a distributed range-partitioned
# parallel prefix (e81 pattern), never a global single-partition sort.
# The oracle replays the merged ECDF with plain window sums.
_E100_ORACLE = """
WITH tagged AS (
  SELECT value AS v,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), va AS (
  SELECT v, count(*) AS ca FROM tagged WHERE in_a GROUP BY 1
), vb AS (
  SELECT v, count(*) AS cb FROM tagged WHERE NOT in_a GROUP BY 1
), m AS (
  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM va FULL JOIN vb USING (v)
), c AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cuma, sum(cb) OVER (ORDER BY v) AS cumb,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM m
), s AS (
  SELECT max(na) AS n_a, max(nb) AS n_b,
         max(abs(cuma::DOUBLE / na - cumb::DOUBLE / nb)) AS d
  FROM c
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(d, 4) AS ks_d,
       round(least(1.0, 2 * exp(-2 * pow(d * sqrt(n_a::DOUBLE * n_b / (n_a + n_b)), 2))), 4)
         AS p_value
FROM s
"""


@query("e100_ks_test", _E100_ORACLE)
def e100_ks_test(spark, sf_dir):
    from pivot_spark.operators.analytics import ks_test

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(F.col("value").alias("v"), in_a.alias("in_a"))
    return ks_test(
        tagged.filter("in_a").select("v"),
        tagged.filter("NOT in_a").select("v"),
        "v",
    )


# --- E101: user-journey path mining — per-user first-5 event-type
# sequence, ranked by population share. Sorted-struct collect per key
# (one shuffle), path-count aggregate, rank window over distinct paths
# only. Ordered-list slice + string_agg replay in SQL.
_E101_ORACLE = """
WITH p AS (
  SELECT user_id,
         array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS journey
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), c AS (
  SELECT journey, count(*) AS n_keys FROM p GROUP BY 1
)
SELECT journey, CAST(n_keys AS BIGINT) AS n_keys, rank FROM (
  SELECT journey, n_keys,
         CAST(row_number() OVER (ORDER BY n_keys DESC, journey) AS INTEGER) AS rank
  FROM c
) WHERE rank <= 20
"""


@query("e101_user_journeys", _E101_ORACLE)
def e101_user_journeys(spark, sf_dir):
    from pivot_spark.operators.analytics import user_journeys

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()).select(
        "user_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"), "event_id",
    )
    return user_journeys(
        ev, "user_id", "event_type", ["ts_us", "event_id"], max_len=5, top_n=20
    )


# --- E102: pairwise association rules (market-basket over per-user
# event-type sets): support/confidence/lift from one distinct + one
# per-basket self-join bounded by the item vocabulary. Replayed with
# the same joins in SQL.
_E102_ORACLE = """
WITH bi AS (
  SELECT DISTINCT user_id AS b, event_type AS i
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), nb AS (
  SELECT count(DISTINCT b)::DOUBLE AS n FROM bi
), ic AS (
  SELECT i, count(*) AS ci FROM bi GROUP BY 1
), pr AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
)
SELECT item_a, item_b,
       CAST(ca.ci AS BIGINT) AS n_a, CAST(cb.ci AS BIGINT) AS n_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab / nb.n, 4) AS support,
       round(n_ab::DOUBLE / ca.ci, 4) AS conf_a_to_b,
       round(n_ab::DOUBLE / cb.ci, 4) AS conf_b_to_a,
       round(n_ab * nb.n / (ca.ci::DOUBLE * cb.ci), 4) AS lift
FROM pr
JOIN ic ca ON pr.item_a = ca.i
JOIN ic cb ON pr.item_b = cb.i
CROSS JOIN nb
"""


@query("e102_association_rules", _E102_ORACLE)
def e102_association_rules(spark, sf_dir):
    from pivot_spark.operators.analytics import association_rules

    ev = _read(spark, sf_dir, "events")
    return association_rules(ev, "user_id", "event_type")


# --- E103: triangle census of the near-dup graph (degree-ordered
# wedge join, Suri-Vassilvitskii orientation — out-degrees sqrt(m)-
# bounded, no hub explosion). Oracle = plain 3-way edge self-join over
# the same exact-Jaccard pair graph as e31.
_E103_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.4
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY 1
), tri AS (
  SELECT count(*) AS t
  FROM e x JOIN e y ON x.a = y.a AND x.b < y.b
  JOIN e z ON z.a = x.b AND z.b = y.b
), s AS (
  SELECT count(*) AS n_nodes, sum(d) / 2 AS n_edges,
         sum(d * (d - 1) / 2) AS triads
  FROM deg
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
       CAST(t AS BIGINT) AS n_triangles,
       round(CASE WHEN triads > 0 THEN 3.0 * t / triads END, 4) AS clustering
FROM s, tri
"""


@query("e103_triangle_stats", _E103_ORACLE)
def e103_triangle_stats(spark, sf_dir):
    from pivot_spark.operators.components import triangle_stats

    pairs = _mined_pairs(spark, sf_dir, threshold=0.4)
    return triangle_stats(pairs.select("id_a", "id_b"), "id_a", "id_b")


# --- E104: Benford first-digit audit over price columns — the classic
# fabricated-data / unit-mixing check. First digits via pure log10
# arithmetic (no decimal rendering — engine-identical); one conditional
# aggregate for all columns, inline-transposed. Replayed digit-for-
# digit with the same arithmetic.
def _e104_oracle() -> str:
    import math

    cols = ["l_extendedprice", "o_totalprice"]
    tables = {"l_extendedprice": "lineitem", "o_totalprice": "orders"}
    sels = []
    for c in cols:
        t = tables[c]
        digit = f"CAST(floor(abs({c}::DOUBLE) / pow(10.0, floor(log10(abs({c}::DOUBLE))))) AS INTEGER)"
        counts = ", ".join(
            f"count(*) FILTER ({c} IS NOT NULL AND abs({c}::DOUBLE) > 0 AND {digit} = {d}) AS c{d}"
            for d in range(1, 10)
        )
        tot = " + ".join(f"c{d}" for d in range(1, 10))
        chi_terms = " + ".join(
            f"(c{d} / t - {math.log10(1 + 1 / d)!r}) * (c{d} / t - {math.log10(1 + 1 / d)!r}) / {math.log10(1 + 1 / d)!r}"
            for d in range(1, 10)
        )
        for d in range(1, 10):
            sels.append(
                f"SELECT '{c}' AS column, {d} AS digit, CAST(c{d} AS BIGINT) AS n, "
                f"round(c{d} / t, 4) AS observed, "
                # CAST: a bare numeric literal rounds to DECIMAL(18,4) in
                # DuckDB, which a type-aware compare sees as != double
                f"CAST(round({math.log10(1 + 1 / d)!r}, 4) AS DOUBLE) AS expected, "
                f"round(({chi_terms}) * t, 4) AS chi2 "
                f"FROM (SELECT *, ({tot})::DOUBLE AS t FROM (SELECT {counts} FROM {t}))"
            )
    return " UNION ALL ".join(sels)


@query("e104_benford", _e104_oracle())
def e104_benford(spark, sf_dir):
    from pivot_spark.operators.profile import benford_audit

    li = _read(spark, sf_dir, "lineitem").select("l_extendedprice")
    od = _read(spark, sf_dir, "orders").select("o_totalprice")
    a = benford_audit(li, ["l_extendedprice"])
    b = benford_audit(od, ["o_totalprice"])
    return a.unionByName(b)


# --- E105: per-column Shannon entropy (value-distribution information
# content — the ID-like vs category-like screen): one melt, one
# (column, value) count, marginals as window sums. Cell-for-cell
# replay.
_E105_ORACLE = """
WITH pairs AS (
  SELECT col, v FROM (
    SELECT unnest([
      {'col': 'event_type', 'v': CAST(event_type AS VARCHAR)},
      {'col': 'user_bucket', 'v': CAST(user_id % 10 AS VARCHAR)},
      {'col': 'props', 'v': props}
    ]) AS s
    FROM events
  ) t(s), LATERAL (SELECT s.col AS col, s.v AS v) u
  WHERE v IS NOT NULL
), vc AS (
  SELECT col, v, count(*) AS c FROM pairs GROUP BY 1, 2
), cells AS (
  SELECT col, c, sum(c) OVER (PARTITION BY col) AS n FROM vc
), a AS (
  SELECT col, max(n) AS n, count(*) AS nd,
         -sum(c::DOUBLE / n * ln(c::DOUBLE / n)) AS h
  FROM cells GROUP BY col
)
SELECT col AS column, CAST(n AS BIGINT) AS n, CAST(nd AS BIGINT) AS n_distinct,
       round(h, 4) AS entropy,
       round(CASE WHEN nd > 1 THEN h / ln(nd::DOUBLE) END, 4) AS norm_entropy
FROM a
"""


@query("e105_column_entropy", _E105_ORACLE)
def e105_column_entropy(spark, sf_dir):
    from pivot_spark.operators.profile import column_entropy

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"), "props"
    )
    return column_entropy(ev, ["event_type", "user_bucket", "props"])


# --- E106: time-series resample + LOCF gap-fill — per-user daily grid
# from first to last observation, last value carried across empty days.
# Integer epoch-day buckets (no calendar arithmetic), F.sequence spine,
# one window fill. Oracle: generate_series spine + IGNORE NULLS window.
_E106_ORACLE = """
WITH obs AS (
  SELECT user_id AS k, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket,
         (max({'t': ts, 'e': event_id, 'v': value})).v AS obsv
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), bounds AS (
  SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1
), spine AS (
  SELECT k, unnest(generate_series(lo, hi)) AS bucket FROM bounds
), j AS (
  SELECT s.k, s.bucket, o.obsv
  FROM spine s LEFT JOIN obs o ON s.k = o.k AND s.bucket = o.bucket
)
SELECT k AS user_id, bucket,
       round(last_value(obsv IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bucket ROWS UNBOUNDED PRECEDING), 4) AS v,
       obsv IS NULL AS filled
FROM j
"""


@query("e106_resample_locf", _E106_ORACLE)
def e106_resample_locf(spark, sf_dir):
    from pivot_spark.operators.resample import resample_locf

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = resample_locf(
        ev, "user_id", "ts", "value", bucket_seconds=86400, tiebreak_col="event_id"
    )
    return out.select("user_id", "bucket", F.round("v", 4).alias("v"), "filled")


# --- E107: PageRank over the MinHash near-dup graph (same edges as
# e103) — 3 synchronous power iterations, damping 0.85, uniform init.
# Oracle: the e103 exact-Jaccard edge CTE + the iterations unrolled.
def _e107_oracle() -> str:
    edges = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.4
), se AS (
  SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT s, count(*) AS dg FROM se GROUP BY 1
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM deg
), r0 AS (
  SELECT s AS node, dg, 1.0 / (SELECT n FROM nn) AS r FROM deg
)"""
    steps = []
    prev = "r0"
    for it in range(1, 4):
        steps.append(
            f""", c{it} AS (
  SELECT se.d AS node, sum({prev}.r / {prev}.dg) AS inr
  FROM se JOIN {prev} ON {prev}.node = se.s GROUP BY 1
), r{it} AS (
  SELECT d0.s AS node, d0.dg,
         0.15 / (SELECT n FROM nn)
           + 0.85 * coalesce(c{it}.inr, 0) AS r
  FROM deg d0 LEFT JOIN c{it} ON c{it}.node = d0.s
)"""
        )
        prev = f"r{it}"
    return edges + "".join(steps) + f"\nSELECT node, round(r, 4) AS pagerank FROM {prev}"


@query("e107_pagerank", _e107_oracle())
def e107_pagerank(spark, sf_dir):
    from pivot_spark.operators.components import pagerank

    pairs = _mined_pairs(spark, sf_dir, threshold=0.4)
    return pagerank(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        iterations=3,
        damping=0.85,
    )


# --- E108: distributed covariance matrix of the embedding corpus —
# d(d+1)/2 sufficient statistics are the ONLY thing leaving executors
# (one Arrow GEMM pass + one tiny hash aggregate). Oracle: positional
# unnest self-join replay of S, column sums and the centering algebra.
_E108_ORACLE = """
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings WHERE embedding IS NOT NULL
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM embeddings WHERE embedding IS NOT NULL
), m AS (
  SELECT i, sum(v) AS s FROM ex GROUP BY 1
), p AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sp
  FROM ex a JOIN ex b USING (vec_id) WHERE a.i <= b.i
  GROUP BY 1, 2
)
SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
       round((sp - ma.s * mb.s / (SELECT n FROM nn)) / (SELECT n FROM nn), 4) + 0 AS cov
FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
"""


@query("e108_covariance", _E108_ORACLE)
def e108_covariance(spark, sf_dir):
    from pivot_spark.operators.pca import covariance_matrix

    emb = _read(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding", dim=64)


# --- E108b: PCA projection onto the top-2 principal axes. The eigen
# step is driver-side numpy over the d x d covariance (not SQL-
# expressible). Round 7 FOLDED the old rows-only projection row into a
# hash-checked projection-invariant contract (the p26b device, round-6
# verdict item 4): Spark emits the exact row count plus four booleans
# the oracle asserts as TRUE, each a THEOREM about a correct PCA
# projection, so they are deterministic at any scale —
# ok_mean0 := |mean(pc_i)| <= 1e-3 (projections of mean-centered data
# have zero mean; measured ~1e-6 on the fixtures),
# ok_decorrelated := |cov_pop(pc_1, pc_2)| <= 1e-3 (eigenvector
# projections are uncorrelated; measured ~1e-6),
# ok_var_order := var_pop(pc_1) >= var_pop(pc_2) > 0 (eigenvalue
# order), and ok_dominant := var_pop(pc_1) >= max_i var_pop(x_i)
# (lambda_1 dominates every diagonal entry of the covariance;
# measured 0.029 vs 0.019). An eigen-solver or projection regression
# flips the gate red instead of hiding behind a rows-only check;
# orthonormality/reconstruction stay unit-tested in tests/test_pca.py.
_E108B_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows, 2 AS k,
       TRUE AS ok_mean0, TRUE AS ok_decorrelated,
       TRUE AS ok_var_order, TRUE AS ok_dominant
FROM embeddings WHERE embedding IS NOT NULL
"""


@query("e108b_pca_project", _E108B_ORACLE)
def e108b_pca_project(spark, sf_dir):
    from pivot_spark.operators.pca import pca_project

    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    out = pca_project(emb, "embedding", dim=64, k=2).select(
        F.col("pc")[0].alias("__p1"), F.col("pc")[1].alias("__p2")
    )
    proj = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("__p1").alias("__m1"),
        F.avg("__p2").alias("__m2"),
        F.var_pop("__p1").alias("__v1"),
        F.var_pop("__p2").alias("__v2"),
        F.covar_pop("__p1", "__p2").alias("__cv"),
    )
    coord_var = (
        emb.select(F.posexplode("embedding").alias("__i", "__x"))
        .groupBy("__i")
        .agg(F.var_pop(F.col("__x").cast("double")).alias("__vv"))
        .agg(F.max("__vv").alias("__maxv"))
    )
    return proj.crossJoin(coord_var).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.lit(2).alias("k"),
        (
            (F.abs("__m1") <= 1e-3) & (F.abs("__m2") <= 1e-3)
        ).alias("ok_mean0"),
        (F.abs("__cv") <= 1e-3).alias("ok_decorrelated"),
        (
            (F.col("__v1") >= F.col("__v2")) & (F.col("__v2") > 0)
        ).alias("ok_var_order"),
        (F.col("__v1") >= F.col("__maxv") - 1e-6).alias("ok_dominant"),
    )


# --- E109: hashed-feature linear classifier scoring (fastText-style
# quality filter) — tokenize, feature-hash, weight-fold, sigmoid, all
# scan-stage scalar expressions: zero shuffles, zero Python. The seeded
# weight table is md5 arithmetic, replayed term-for-term in SQL.
_E109_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           1.0 / (1.0 + exp(-(0.0 + list_sum(list_transform(toks, tk ->
             (('0x' || substring(md5('w:quality:' || CAST(
                 ('0x' || substring(md5('fh:quality:' || tk), 1, 15))::BIGINT % 1024
               AS VARCHAR)), 1, 15))::BIGINT % 2000001) / 1000000.0 - 1.0
           )) / len(toks))))
         END AS score
  FROM t
)
SELECT doc_id, round(score, 4) AS score,
       coalesce(score >= 0.5, false) AS keep
FROM s
"""


@query("e109_quality_classifier", _E109_ORACLE)
def e109_quality_classifier(spark, sf_dir):
    from pivot_spark.operators.classifier import hashed_linear_score

    docs = _read(spark, sf_dir, "documents")
    out = hashed_linear_score(
        docs, "text", num_buckets=1024, seed="quality", bias=0.0, threshold=0.5
    )
    return out.select("doc_id", F.round("score", 4).alias("score"), "keep")


# --- E110: batch sessionization via the native session_window aggregate
# (the Structured Streaming operator run in batch — one shuffle, merge-
# in-aggregate, no per-user sort). Oracle: lag + cumsum with the window
# merge rule (events merge while the gap is <= the duration; probed in
# tests/test_round2_ops.py — an event exactly at the previous window's
# end still merges).
_E110_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS em
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), b AS (
  SELECT user_id, em,
         CASE WHEN em - lag(em) OVER (PARTITION BY user_id ORDER BY em)
                   <= 1800000000
              THEN 0 ELSE 1 END AS brk
  FROM e
), s AS (
  SELECT user_id, em,
         sum(brk) OVER (PARTITION BY user_id ORDER BY em
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT user_id, CAST(min(em) AS BIGINT) AS t_start,
       CAST(max(em) + 1800000000 AS BIGINT) AS t_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@query("e110_session_window", _E110_ORACLE)
def e110_session_window(spark, sf_dir):
    from pivot_spark.operators.sessionize import session_stats_native

    ev = _read(spark, sf_dir, "events")
    return session_stats_native(ev, "user_id", "ts", "30 minutes")


# --- E111: per-key EWMA smoothing — a true sequential recurrence
# (EWMA_i = a·x_i + (1-a)·EWMA_{i-1}), computed as an ordered array
# fold per key (a lag window cannot reference its own output, and
# closed-form rescaling overflows on long streams). Oracle: the e53
# recursive-CTE replay, same arithmetic in the same order.
_E111_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), w AS (
  SELECT user_id, rn, v, v AS s FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.v, 0.3 * e.v + 0.7 * w.s
  FROM ev e JOIN w ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS INTEGER) AS seq, v AS value, round(s, 4) AS ewma
FROM w
"""


@query("e111_ewma", _E111_ORACLE)
def e111_ewma(spark, sf_dir):
    from pivot_spark.operators.rolling import ewma

    ev = _read(spark, sf_dir, "events")
    out = ewma(ev, ["user_id"], "ts", "value", alpha=0.3, order_cols=["event_id"])
    return out.select(
        "user_id", "seq", "value", F.round("ewma", 4).alias("ewma")
    )


# --- E112: seasonal-profile anomaly detection — hour-of-day z-scores
# per event_type, profile broadcast back onto an unshuffled fact scan.
# Integer epoch phase arithmetic, replayed term-for-term.
_E112_ORACLE = """
WITH b AS (
  SELECT event_id, event_type,
         CAST(floor(floor(epoch_us(ts) / 1000000) / 3600) % 24 AS INTEGER) AS phase,
         value::DOUBLE AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS (
  SELECT event_type, phase, avg(v) AS mu, stddev_pop(v) AS sd, count(*) AS n
  FROM b GROUP BY 1, 2
)
SELECT b.event_id, b.event_type, b.phase, b.v,
       round(CASE WHEN p.n > 1 AND p.sd > 0 THEN (b.v - p.mu) / p.sd END, 4) AS z,
       coalesce(abs(CASE WHEN p.n > 1 AND p.sd > 0 THEN (b.v - p.mu) / p.sd END)
                >= 3.0, false) AS is_anomaly
FROM b JOIN p USING (event_type, phase)
"""


@query("e112_seasonal_anomaly", _E112_ORACLE)
def e112_seasonal_anomaly(spark, sf_dir):
    from pivot_spark.operators.analytics import seasonal_anomalies

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    out = seasonal_anomalies(ev, "event_type", "ts", "value", sigma=3.0)
    return out.select("event_id", "event_type", "phase", "v", "z", "is_anomaly")


# --- E113/E114: distributed BPE subword learning + tokenization
# (Sennrich et al. 2016). Learning touches the corpus once (word
# histogram), then iterates on the vocab-sized frame; merges are greedy
# left-to-right literal replaces on space-joined symbol strings — which
# makes even the iterative learning SQL-replayable (kmeans-style
# unrolled iterations, driver argmax == ORDER/LIMIT CTE).
_BPE_N = 3


def _bpe_cte(n: int) -> str:
    parts = [
        r"""
WITH w AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY 1
), s0 AS (
  SELECT array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
           || ' </w>' AS sym, c
  FROM w
)"""
    ]
    for it in range(1, n + 1):
        parts.append(
            f""", p{it} AS (
  SELECT sp[i] AS l, sp[i + 1] AS r, sum(c) AS n
  FROM (SELECT string_split(sym, ' ') AS sp, c FROM s{it - 1}),
       unnest(range(1, len(sp))) AS u(i)
  GROUP BY 1, 2
), t{it} AS (SELECT l, r, n FROM p{it} ORDER BY n DESC, l, r LIMIT 1),
s{it} AS (
  SELECT trim(replace(' ' || sym || ' ',
                      (SELECT ' '||l||' '||r||' ' FROM t{it}),
                      (SELECT ' '||l||r||' ' FROM t{it}))) AS sym, c
  FROM s{it - 1}
)"""
        )
    return "".join(parts)


def _e113_oracle() -> str:
    selects = [
        f"SELECT {it} AS merge_idx, l AS left, r AS right, CAST(n AS BIGINT) AS pair_count FROM t{it}"
        for it in range(1, _BPE_N + 1)
    ]
    return _bpe_cte(_BPE_N) + "\n" + "\nUNION ALL\n".join(selects)


@query("e113_bpe_learn", _e113_oracle())
def e113_bpe_learn(spark, sf_dir):
    from pivot_spark.operators.bpe import bpe_learn

    docs = _read(spark, sf_dir, "documents")
    out = bpe_learn(docs, "text", num_merges=_BPE_N)
    return out.select(
        "merge_idx",
        F.col("left").alias("left"),
        F.col("right").alias("right"),
        "pair_count",
    )


def _e114_oracle() -> str:
    # encode every document with the learned merges: per-doc symbol
    # strings through the same 3 replaces, then split back to tokens
    enc = r""", d0 AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
           wd -> array_to_string(list_transform(range(1, len(wd) + 1), i -> wd[i]), ' ')
                   || ' </w>') AS syms
  FROM documents
)"""
    for it in range(1, _BPE_N + 1):
        # the merge pattern joins in as a plain column (DuckDB forbids
        # subqueries inside lambda bodies)
        enc += f""", d{it} AS (
  SELECT doc_id,
         list_transform(syms, s -> trim(replace(' ' || s || ' ', m{it}.pat, m{it}.rep))) AS syms
  FROM d{it - 1},
       (SELECT ' '||l||' '||r||' ' AS pat, ' '||l||r||' ' AS rep FROM t{it}) m{it}
)"""
    return (
        _bpe_cte(_BPE_N)
        + enc
        + f"""
SELECT doc_id,
       '[' || coalesce(array_to_string(flatten(list_transform(syms, s -> string_split(s, ' '))), '|'), '') || ']' AS tokens,
       CAST(len(flatten(list_transform(syms, s -> string_split(s, ' ')))) AS BIGINT) AS n_tokens
FROM d{_BPE_N}"""
    )


@query("e114_bpe_encode", _e114_oracle())
def e114_bpe_encode(spark, sf_dir):
    from pivot_spark.operators.bpe import bpe_encode, bpe_learn

    docs = _read(spark, sf_dir, "documents")
    merges = [(r.left, r.right) for r in bpe_learn(docs, "text", num_merges=_BPE_N).collect()]
    out = bpe_encode(docs, "text", merges)
    out = out.select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )
    return serialize_arrays(out)


# --- E115: leakage-safe train/valid/test split — the e25 hash split
# keyed by the near-dup CLUSTER representative instead of the doc id,
# so near-duplicate documents can never straddle train and eval (the
# contamination mode plain id-hashing misses). Composition: minhash
# pairs -> connected components -> scan-stage CASE split on the label.
def _e115_oracle() -> str:
    t1 = _sample_threshold(0.8)
    t2 = _sample_threshold(0.9)
    return (
        _E31_ORACLE.rsplit("SELECT d.doc_id", 1)[0]
        + f"""SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       CASE
         WHEN substring(md5('s42:' || CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '{t1}' THEN 'train'
         WHEN substring(md5('s42:' || CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '{t2}' THEN 'valid'
         ELSE 'test'
       END AS split
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""
    )


@query("e115_leakage_safe_split", _e115_oracle())
def e115_leakage_safe_split(spark, sf_dir):
    from pivot_spark.operators.components import dedup_clusters
    from pivot_spark.operators.sample import hash_split

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    clustered = dedup_clusters(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    ).select("doc_id", "cluster")
    return hash_split(
        clustered, "cluster", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="s42"
    )


# --- E116: deterministic negative sampling for contrastive training —
# k pseudo-random non-neighbor ids per anchor, self and known near-dup
# positives excluded; md5 probe positions resolve against a dense id
# index built by the DISTRIBUTED ranker (no global sort). Oracle:
# row_number index + probe arithmetic + anti-join replay.
def _e116_oracle() -> str:
    pairs_cte = _E31_ORACLE.split("), edges AS (")[0].replace(
        "WITH RECURSIVE sh AS (", "WITH sh AS ("
    )
    return (
        pairs_cte
        + r"""
), idx AS (
  SELECT doc_id AS cand, row_number() OVER (ORDER BY doc_id) - 1 AS pos
  FROM documents
), nn AS (SELECT count(*) AS n FROM documents),
probes AS (
  SELECT d.doc_id AS anchor, t.j,
         ('0x' || substring(md5('neg:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)), 1, 15))::BIGINT
           % (SELECT n FROM nn) AS pos
  FROM documents d, unnest(range(0, 15)) AS t(j)
), cand AS (
  SELECT p.anchor, i.cand, p.j
  FROM probes p JOIN idx i USING (pos)
  WHERE i.cand != p.anchor
    AND NOT EXISTS (SELECT 1 FROM pairs x
                    WHERE (x.id_a = p.anchor AND x.id_b = i.cand)
                       OR (x.id_b = p.anchor AND x.id_a = i.cand))
), best AS (
  SELECT anchor, cand, min(j) AS j FROM cand GROUP BY 1, 2
)
SELECT anchor, cand AS negative, CAST(rk AS INTEGER) AS neg_rank FROM (
  SELECT anchor, cand,
         row_number() OVER (PARTITION BY anchor ORDER BY j, cand) AS rk
  FROM best
) WHERE rk <= 5"""
    )


@query("e116_negative_sampling", _e116_oracle())
def e116_negative_sampling(spark, sf_dir):
    from pivot_spark.operators.sample import negative_sample_k

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    return negative_sample_k(
        docs.select("doc_id"),
        "doc_id",
        k=5,
        positives=pairs.select("id_a", "id_b"),
    )


# --- E117: perceptual-hash (aHash) image near-dup — the multimodal
# dedup rung: payload-byte "pixels" (the codec is the only stub, as in
# e07/e87), above-mean bit packing, SimHash-style block candidate join,
# exact bit_count(xor) verify. The oracle replays pixels from the SAME
# ascii text bytes (the payload), the packing arithmetic bit for bit,
# and an all-pairs hamming filter — the block join is a guaranteed
# superset (6 blocks > max hamming 5), so both sides agree exactly.
_E117_ORACLE = """
WITH px AS (
  SELECT doc_id,
         list_transform(range(0, 60),
                        i -> ascii(text[((i % length(text)) + 1)])) AS p
  FROM documents
), h AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, 60), i ->
           CASE WHEN p[i + 1] > list_sum(p) / 60.0
                THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS hash
  FROM px
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.hash, b.hash)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hash, b.hash)) <= 5
"""


@query("e117_image_neardup", _E117_ORACLE)
def e117_image_neardup(spark, sf_dir):
    from pivot_spark.operators import multimodal as M

    docs = _read(spark, sf_dir, "documents")
    imgs = docs.select(
        "doc_id",
        M.make_fake_image(
            (F.col("doc_id") % 64 + 1).cast("int"),
            (F.col("doc_id") % 48 + 1).cast("int"),
            F.encode(F.col("text"), "UTF-8"),
        ).alias("image"),
    )
    return M.ahash_pairs(imgs, "doc_id", "image", max_hamming=5)


# --- E118: Luhn-validated credit-card redaction — the PII scrub step a
# pure regex cannot do: card-shaped digit runs are replaced only when
# the ISO/IEC 7812 check digit validates, so order ids / timestamps
# survive. Text augmented with deterministic synthetic numbers (the
# corpus has none): one fixed VALID test number and one doc-dependent
# run whose validity varies with doc_id — the oracle replays the
# checksum, not a pattern list.
_E118_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' pay 4111 1111 1111 1111 order 410000000000' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), cand AS (
  SELECT doc_id, t, unnest(regexp_extract_all(t, '\b\d(?:[ -]?\d){12,18}\b')) AS c
  FROM aug
), val AS (
  SELECT doc_id, c FROM (
    SELECT doc_id, c,
           list_transform(regexp_extract_all(c, '\d'), d -> d::INT) AS ds
    FROM cand
  )
  WHERE len(ds) BETWEEN 13 AND 19
    AND list_sum(list_transform(range(0, len(ds)), i ->
          CASE WHEN i % 2 = 1
               THEN CASE WHEN 2 * ds[len(ds) - i] > 9
                         THEN 2 * ds[len(ds) - i] - 9
                         ELSE 2 * ds[len(ds) - i] END
               ELSE ds[len(ds) - i] END)) % 10 = 0
), folded AS (
  SELECT a.doc_id,
         list_reduce(
           list_prepend(any_value(a.t),
                        coalesce(list(DISTINCT v.c ORDER BY length(v.c) DESC, v.c), [])),
           (acc, c) -> replace(acc, c, '<CARD>')) AS redacted
  FROM aug a LEFT JOIN val v USING (doc_id)
  GROUP BY a.doc_id
)
SELECT doc_id, redacted FROM folded
"""


@query("e118_redact_cards", _E118_ORACLE)
def e118_redact_cards(spark, sf_dir):
    from pivot_spark.functions.redact import redact_cards

    df = _read(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" pay 4111 1111 1111 1111 order 410000000000"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return df.select("doc_id", redact_cards(aug).alias("redacted"))


# --- E119: two-sample Welch t statistic over the md5-split halves (the
# e99/e100 drift family's mean-level significance summary) — one
# aggregate per arm, closed-form t + Satterthwaite dof replayed
# term-for-term (no t-CDF builtin in either engine; downstream converts).
_E119_ORACLE = """
WITH tagged AS (
  SELECT value AS v,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), sa AS (
  SELECT count(*)::DOUBLE AS n_a, avg(v) AS m_a, var_samp(v) AS s2_a
  FROM tagged WHERE in_a
), sb AS (
  SELECT count(*)::DOUBLE AS n_b, avg(v) AS m_b, var_samp(v) AS s2_b
  FROM tagged WHERE NOT in_a
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(s2_a / n_a + s2_b / n_b), 4) AS t,
       round(pow(s2_a / n_a + s2_b / n_b, 2) /
             (pow(s2_a / n_a, 2) / (n_a - 1) + pow(s2_b / n_b, 2) / (n_b - 1)),
             4) AS dof
FROM sa, sb
"""


@query("e119_welch_t", _E119_ORACLE)
def e119_welch_t(spark, sf_dir):
    from pivot_spark.operators.analytics import welch_t_test

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(F.col("value").alias("v"), in_a.alias("in_a"))
    return welch_t_test(
        tagged.filter("in_a"), tagged.filter("NOT in_a"), "v"
    )


# --- E120: CUPED variance reduction (Deng et al. 2013): per-user
# post-period metric adjusted by the pre-period covariate, theta from
# ONE tiny aggregate broadcast back — the experiment-analysis staple.
# Period split at a fixed epoch day (data covers 2024-01); replayed
# with the same integer-day arithmetic and theta algebra.
_E120_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         avg(CASE WHEN floor(epoch(ts) / 86400) >= 19738 THEN value END) AS y,
         avg(CASE WHEN floor(epoch(ts) / 86400) <  19738 THEN value END) AS x
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), st AS (
  SELECT covar_pop(x, y) AS cxy, var_pop(x) AS vx, avg(x) AS mx
  FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
)
SELECT user_id, round(y, 4) AS y, round(x, 4) AS x,
       round(CASE WHEN x IS NOT NULL AND y IS NOT NULL
                  THEN y - (CASE WHEN vx > 0 THEN cxy / vx ELSE 0 END) * (x - mx)
                  ELSE y END, 4) AS y_adj
FROM per_user, st
"""


@query("e120_cuped", _E120_ORACLE)
def e120_cuped(spark, sf_dir):
    from pivot_spark.operators.analytics import cuped_adjust

    ev = _read(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000) / F.lit(86400))
    per_user = ev.groupBy("user_id").agg(
        F.avg(F.when(day >= 19738, F.col("value"))).alias("y"),
        F.avg(F.when(day < 19738, F.col("value"))).alias("x"),
    )
    out = cuped_adjust(per_user, "y", "x")
    return out.select(
        "user_id", F.round("y", 4).alias("y"), F.round("x", 4).alias("x"), "y_adj"
    )


# --- E121: RFM segmentation over orders — per-customer recency /
# frequency / monetary scored 1-5 against exact corpus quantile
# boundaries from ONE broadcast single-row aggregate (no global ntile
# sort). Replayed with quantile_cont and the same strictly-greater
# boundary rule.
_E121_ORACLE = """
WITH per AS (
  SELECT o_custkey AS custkey, count(*) AS frequency,
         sum(o_totalprice) AS mon,
         max(floor(epoch(o_orderdate) / 86400)) AS last_d
  FROM orders GROUP BY 1
), st AS (
  SELECT max(last_d) AS mx,
         quantile_cont(last_d::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS ql,
         quantile_cont(frequency::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS qf,
         quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS qm
  FROM per
), sc AS (
  SELECT custkey, CAST(mx - last_d AS BIGINT) AS recency_days, frequency,
         round(mon, 4) AS monetary,
         CAST(1 + (last_d::DOUBLE > ql[1])::INT + (last_d::DOUBLE > ql[2])::INT
                + (last_d::DOUBLE > ql[3])::INT + (last_d::DOUBLE > ql[4])::INT
              AS INTEGER) AS r_score,
         CAST(1 + (frequency::DOUBLE > qf[1])::INT + (frequency::DOUBLE > qf[2])::INT
                + (frequency::DOUBLE > qf[3])::INT + (frequency::DOUBLE > qf[4])::INT
              AS INTEGER) AS f_score,
         CAST(1 + (mon > qm[1])::INT + (mon > qm[2])::INT
                + (mon > qm[3])::INT + (mon > qm[4])::INT
              AS INTEGER) AS m_score
  FROM per, st
)
SELECT custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
         CAST(m_score AS VARCHAR) AS rfm
FROM sc
"""


@query("e121_rfm", _E121_ORACLE)
def e121_rfm(spark, sf_dir):
    from pivot_spark.operators.analytics import rfm_segments

    o = _read(spark, sf_dir, "orders")
    out = rfm_segments(o, "o_custkey", "o_orderdate", "o_totalprice", n_tiles=5)
    return out.withColumnRenamed("o_custkey", "custkey")


# --- E122: two-sided CUSUM change-point detection (Page 1954) per user
# — a sequential recurrence on its own output, run as the e111 ordered
# array fold; per-key mean/std come from the same collected array (one
# shuffle total). Oracle: per-key stats CTE + recursive-CTE replay in
# the same fold order.
_E122_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), st AS (
  SELECT user_id, avg(v) AS mu, stddev_pop(v) AS sd FROM ev GROUP BY 1
), z AS (
  SELECT e.user_id, e.rn, e.v,
         CASE WHEN s.sd > 0 THEN (e.v - s.mu) / s.sd ELSE 0.0 END AS z
  FROM ev e JOIN st s USING (user_id)
), w AS (
  SELECT user_id, rn, v,
         greatest(0.0, z - 0.5) AS sp, greatest(0.0, -z - 0.5) AS sm
  FROM z WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.v,
         greatest(0.0, w.sp + e.z - 0.5), greatest(0.0, w.sm - e.z - 0.5)
  FROM z e JOIN w ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS INTEGER) AS seq, v AS value,
       round(sp, 4) AS s_pos, round(sm, 4) AS s_neg,
       (sp > 4.0 OR sm > 4.0) AS alarm
FROM w
"""


@query("e122_cusum", _E122_ORACLE)
def e122_cusum(spark, sf_dir):
    from pivot_spark.operators.rolling import cusum_changepoints

    ev = _read(spark, sf_dir, "events")
    out = cusum_changepoints(
        ev, ["user_id"], "ts", "value", k=0.5, h=4.0, order_cols=["event_id"]
    )
    return out.select(
        "user_id", "seq", "value",
        F.round("s_pos", 4).alias("s_pos"),
        F.round("s_neg", 4).alias("s_neg"),
        "alarm",
    )


# --- E123: EXACT thresholded cosine self-join over 3-gram TF-IDF
# vectors — the *weighted* sibling of the e10 Jaccard join: shingle
# sets (Arrow-batched, the e03/e10 corpus-scale tokenizer) weighted by
# idf, L2-normalized, and multiplied via the inverted-index sparse dot
# product (ONE pair-keyed aggregate; join volume = sum(df^2), bounded
# by shingle granularity — bigram terms on this uniform-weight corpus
# measured 90s at sf0.1, trigrams ~4s). The operator's AllPairs prefix
# filter stays off here: near-uniform weights defeat weight-based
# pruning (measured). Oracle: naive all-pairs replay of the same
# tf/idf/normalize arithmetic.
_E123_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 1) + 1),
    i -> array_to_string(w[i:i+2], ' '))) AS grams
  FROM toks
), g AS (
  SELECT doc_id, t.g
  FROM sh, LATERAL unnest(grams) AS t(g)
), dfq AS (
  SELECT g, count(*) AS df FROM g GROUP BY 1
), wv AS (
  SELECT g.doc_id, g.g,
         ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / dfq.df) AS w
  FROM g JOIN dfq USING (g)
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wv GROUP BY 1
), wn AS (
  SELECT wv.doc_id, wv.g, wv.w / nrm.nrm AS wn
  FROM wv JOIN nrm USING (doc_id) WHERE nrm.nrm > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(sum(a.wn * b.wn), 4) AS cosine
FROM wn a JOIN wn b ON a.g = b.g AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING sum(a.wn * b.wn) >= 0.35
"""


@query("e123_tfidf_cosine_join", _E123_ORACLE)
def e123_tfidf_cosine_join(spark, sf_dir):
    from pivot_spark.operators.neardup import word_shingles_pd
    from pivot_spark.operators.tfidf import tfidf_cosine_pairs

    # spread: the Arrow shingler otherwise runs on the single-file
    # scan's ONE task (guide §2.5); nondeterministic: optimizer fence
    # against the double ArrowEvalPython the downstream explode's
    # pushed size/isnotnull filter induces (guide §4.4) — the plan had
    # the tokenizer evaluated twice per row
    d = _read_spread(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        word_shingles_pd(
            F.lower(F.col("text")), 3, nondeterministic=True
        ).alias("grams"),
    )
    out = tfidf_cosine_pairs(docs, "doc_id", "grams", threshold=0.35)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


# --- E124: document-level PMI / NPMI co-occurrence (Church & Hanks
# 1990) — collocation mining over per-doc DISTINCT terms; pair fan-out
# is vocab-bounded per doc (the e102 basket shape), never corpus-
# quadratic. Oracle: the same joins replayed.
_E124_ORACLE = r"""
WITH dt AS (
  -- mirrors pmi_pairs max_terms_per_doc=1000: top-N terms per doc by
  -- (in-doc count DESC, term ASC); no-op while docs stay under the cap
  SELECT doc_id, term FROM (
    SELECT doc_id, t.term, count(*) AS c
    FROM documents,
         LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    w -> w <> '')) AS t(term)
    GROUP BY 1, 2
  ) QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, term) <= 1000
), marg AS (
  SELECT term, count(*) AS n FROM dt GROUP BY 1
), nd AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2 HAVING count(*) >= 50
)
SELECT term_a, term_b, n_ab, ma.n AS n_a, mb.n AS n_b,
       round(ln(n_ab * nd.n_docs / (ma.n * mb.n)), 4) AS pmi,
       round(CASE WHEN n_ab = nd.n_docs THEN 1.0
                  ELSE ln(n_ab * nd.n_docs / (ma.n * mb.n))
                       / -ln(n_ab / nd.n_docs) END, 4) AS npmi
FROM pairs
JOIN marg ma ON pairs.term_a = ma.term
JOIN marg mb ON pairs.term_b = mb.term
CROSS JOIN nd
"""


@query("e124_pmi_cooccurrence", _E124_ORACLE)
def e124_pmi_cooccurrence(spark, sf_dir):
    from pivot_spark.operators.cooccur import pmi_pairs

    d = _read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    docs = d.select("doc_id", toks.alias("toks"))
    out = pmi_pairs(docs, "doc_id", "toks", min_pair_count=50)
    return out.select(
        "term_a", "term_b", "n_ab", "n_a", "n_b",
        F.round("pmi", 4).alias("pmi"),
        F.round("npmi", 4).alias("npmi"),
    )


# --- E125: Flesch reading ease + Flesch–Kincaid grade over
# deterministically sentence-augmented text (a period spliced after
# every 7th token — the corpus has no punctuation) — scan-stage
# token/sentence/vowel-group arithmetic, zero shuffles. Replayed
# term-for-term (Java regex and RE2 agree on the splice pattern;
# only the replacement backref syntax differs).
_E125_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         regexp_replace(lower(text), '((?:\S+ ){6}\S+) ', '\1. ', 'g') AS t
  FROM documents
), f AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS ws,
         greatest(1, len(regexp_extract_all(t, '[.!?]+'))) AS s
  FROM aug
), g AS (
  SELECT doc_id, len(ws) AS w, s,
         list_sum(list_transform(ws,
           x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))) AS syl
  FROM f
)
SELECT doc_id, CAST(w AS INTEGER) AS n_words, CAST(s AS INTEGER) AS n_sentences,
       CAST(syl AS INTEGER) AS n_syllables,
       round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                     - 84.6 * (syl / CAST(w AS DOUBLE)), 4) AS flesch,
       round(0.39 * (w / CAST(s AS DOUBLE))
             + 11.8 * (syl / CAST(w AS DOUBLE)) - 15.59, 4) AS fk_grade
FROM g
"""


@query("e125_readability", _E125_ORACLE)
def e125_readability(spark, sf_dir):
    from pivot_spark.functions.text import (
        fk_grade,
        flesch_reading_ease,
        sentence_count,
        syllable_count,
        token_count,
    )

    d = _read(spark, sf_dir, "documents")
    aug = F.regexp_replace(
        F.lower(F.col("text")), r"((?:\S+ ){6}\S+) ", r"$1. "
    )
    t = d.select("doc_id", aug.alias("t"))
    return t.select(
        "doc_id",
        token_count(F.col("t")).alias("n_words"),
        sentence_count(F.col("t")).alias("n_sentences"),
        syllable_count(F.col("t")).alias("n_syllables"),
        F.round(flesch_reading_ease(F.col("t")), 4).alias("flesch"),
        F.round(fk_grade(F.col("t")), 4).alias("fk_grade"),
    )


# --- E126: per-domain corpus composition + blocklist audit (the C4
# badlist filter's reporting side) over deterministically URL-augmented
# documents: parse_url host -> registrable-domain heuristic (public-
# suffix-lite) -> ONE domain-keyed aggregate, total broadcast back.
# Oracle: host via regexp, same label arithmetic.
_E126_ORACLE = """
WITH u AS (
  SELECT doc_id, lang, n_chars,
         'https://' ||
         CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN '' ELSE 'cdn.assets.' END ||
         source ||
         CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
                         WHEN 2 THEN '.org' ELSE '.io' END ||
         '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), h AS (
  SELECT doc_id, lang, n_chars,
         string_split(lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)), '.') AS ls
  FROM u
), r AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN len(ls) >= 3 AND length(ls[len(ls)]) = 2
                   AND ls[len(ls) - 1] IN ('co','com','ac','gov','org','net','edu')
              THEN array_to_string(ls[len(ls) - 2:len(ls)], '.')
              ELSE array_to_string(ls[greatest(1, len(ls) - 1):len(ls)], '.') END
           AS domain
  FROM h
), per AS (
  SELECT domain, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
         avg(n_chars) AS avg_size
  FROM r GROUP BY 1
), tot AS (SELECT sum(n_docs) AS t FROM per)
SELECT domain, n_docs, n_langs, round(avg_size, 4) AS avg_size,
       round(n_docs / CAST(t AS DOUBLE), 4) AS share,
       domain IN ('src0.com', 'src3.org') AS blocked
FROM per, tot
"""
