"""Round-2 operator batch: resample/LOCF, PageRank, covariance/PCA,
hashed linear classifier, native session windows."""

import datetime
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# --- resample_locf -----------------------------------------------------------


def test_resample_locf_fills_gaps(spark):
    t0 = 1_700_000_000  # epoch seconds
    rows = [
        # key 1: observations on buckets 0, 2 (gap at 1)
        (1, t0 + 10, 10.0),
        (1, t0 + 2 * 86400 + 5, 30.0),
        # key 2: single observation
        (2, t0 + 50, 7.0),
    ]
    df = spark.createDataFrame(rows, "k long, sec long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    from pivot_spark.operators.resample import resample_locf

    out = resample_locf(df, "k", "ts", "value").collect()
    b0 = t0 // 86400
    got = {(r.k, r.bucket): (r.v, r.filled) for r in out}
    assert got[(1, b0)] == (10.0, False)
    assert got[(1, b0 + 1)] == (10.0, True)  # carried forward
    assert got[(1, b0 + 2)] == (30.0, False)
    assert got[(2, b0)] == (7.0, False)
    assert len(out) == 4


def test_resample_locf_last_in_bucket_wins(spark):
    t0 = 1_700_000_000
    rows = [
        (1, t0 + 10, 5, 1.0),
        (1, t0 + 10, 6, 2.0),  # same ts, higher tiebreak wins
        (1, t0 + 20, 1, 3.0),  # later ts wins the bucket
    ]
    df = spark.createDataFrame(rows, "k long, sec long, eid long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "eid", "value"
    )
    from pivot_spark.operators.resample import resample_locf

    out = resample_locf(df, "k", "ts", "value", tiebreak_col="eid").collect()
    assert len(out) == 1 and out[0].v == 3.0

    # drop the later ts: tiebreak decides
    out2 = resample_locf(
        df.filter("eid != 1"), "k", "ts", "value", tiebreak_col="eid"
    ).collect()
    assert out2[0].v == 2.0


def test_resample_locf_rejects_bad_bucket(spark):
    df = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, value double")
    from pivot_spark.operators.resample import resample_locf

    with pytest.raises(ValueError):
        resample_locf(df, "k", "ts", "value", bucket_seconds=0)


# --- pagerank ----------------------------------------------------------------


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    deg = [0] * n
    for a, b in edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = [1.0 / n] * n
    for _ in range(iterations):
        nxt = [(1 - damping) / n] * n
        for u in range(n):
            for v in adj[u]:
                nxt[v] += damping * r[u] / deg[u]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_reference_power_iteration(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]  # triangle + pendant
    df = spark.createDataFrame(edges, "src long, dst long")
    from pivot_spark.operators.components import pagerank

    got = {r.node: r.pagerank for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-3
    # mass conservation (no dangling nodes in a symmetrized graph)
    assert abs(sum(got.values()) - 1.0) < 1e-3
    # the hub (3) outranks the pendant (4)
    assert got[3] > got[4]


def test_pagerank_dedups_and_ignores_self_loops(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (1, 2)], "src long, dst long"
    )
    from pivot_spark.operators.components import pagerank

    got = {r.node: r.pagerank for r in pagerank(df, iterations=2).collect()}
    # two symmetric nodes: equal rank, sums to 1
    assert got[1] == got[2]
    assert abs(sum(got.values()) - 1.0) < 1e-3


# --- covariance / PCA --------------------------------------------------------


def _vec_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_covariance_matches_numpy(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(40, 3) * [1.0, 2.0, 0.5] + [5.0, -1.0, 0.0]
    from pivot_spark.operators.pca import covariance_matrix

    got = {(r.i, r.j): r.cov for r in covariance_matrix(_vec_df(spark, X), "embedding", 3).collect()}
    C = np.cov(X.T, bias=True)
    for i in range(3):
        for j in range(i, 3):
            assert abs(got[(i, j)] - round(C[i, j], 4)) < 1e-9
    assert len(got) == 6


def test_pca_project_invariants(spark):
    rng = np.random.RandomState(11)
    # anisotropic cloud: variance concentrated along a known direction
    base = rng.randn(200, 4) * [3.0, 1.0, 0.3, 0.1]
    from pivot_spark.operators.pca import (
        explained_variance,
        pca_project,
        _principal_axes,
    )

    df = _vec_df(spark, base)
    comps, mu, vals = _principal_axes(df, "embedding", 4, 2)
    # orthonormal rows
    G = comps @ comps.T
    assert np.allclose(G, np.eye(2), atol=1e-8)
    # variance ordering
    assert vals[0] >= vals[1]
    # sign canonicalization: largest-|coord| entry positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    # projection matches numpy
    out = pca_project(df, "embedding", 4, k=2).orderBy("vec_id").collect()
    P = np.array([r.pc for r in out])
    want = (base - base.mean(axis=0)) @ comps.T
    assert np.allclose(P, np.round(want, 4), atol=2e-4)
    ev = explained_variance(df, "embedding", 4, 2)
    assert ev[0] == pytest.approx(np.var(want[:, 0]), rel=1e-6)


def test_pca_rejects_bad_k(spark):
    from pivot_spark.operators.pca import pca_project

    df = _vec_df(spark, np.eye(3))
    with pytest.raises(ValueError):
        pca_project(df, "embedding", 3, k=4)


# --- hashed linear classifier ------------------------------------------------


def test_hashed_linear_score_shape(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, None), (4, "the quick brown fox")],
        "doc_id long, text string",
    )
    from pivot_spark.operators.classifier import hashed_linear_score

    rows = {r.doc_id: r for r in hashed_linear_score(df, "text").collect()}
    assert 0.0 < rows[1].score < 1.0
    assert rows[2].score is None and rows[2].keep is False
    assert rows[3].score is None and rows[3].keep is False
    # deterministic: same text, same score
    assert rows[1].score == rows[4].score
    assert rows[1].keep == (rows[1].score >= 0.5)


def test_hashed_linear_score_bias_shifts(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    from pivot_spark.operators.classifier import hashed_linear_score

    lo = hashed_linear_score(df, "text", bias=-5.0).collect()[0].score
    hi = hashed_linear_score(df, "text", bias=5.0).collect()[0].score
    assert lo < 0.01 and hi > 0.99

    with pytest.raises(ValueError):
        hashed_linear_score(df, "text", num_buckets=0)


# --- native session windows --------------------------------------------------


def test_session_window_native_matches_lag_cumsum(spark):
    t0 = 1_700_000_000
    gap = 1800
    rows = []
    # user 1: two sessions (events 0s,100s | 4000s); user 2: boundary case
    for sec in (0, 100, 4000):
        rows.append((1, t0 + sec))
    # user 2: diff exactly == gap -> still MERGES (gap <= duration)
    rows.append((2, t0))
    rows.append((2, t0 + gap))
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    from pivot_spark.operators.sessionize import session_stats_native

    out = session_stats_native(df, "user_id", "ts", "30 minutes")
    got = sorted(
        [(r.user_id, r.t_start, r.t_end, r.n_events) for r in out.collect()]
    )
    us = 1_000_000
    assert got == [
        (1, t0 * us, (t0 + 100 + gap) * us, 2),
        (1, (t0 + 4000) * us, (t0 + 4000 + gap) * us, 1),
        (2, t0 * us, (t0 + 2 * gap) * us, 2),
    ]


def test_session_window_native_drops_null_keys(spark):
    df = spark.createDataFrame(
        [(None, datetime.datetime(2024, 1, 1)), (1, None), (1, datetime.datetime(2024, 1, 1))],
        "user_id long, ts timestamp",
    )
    from pivot_spark.operators.sessionize import session_stats_native

    assert session_stats_native(df, "user_id", "ts", "30 minutes").count() == 1


# --- ewma --------------------------------------------------------------------


def test_ewma_matches_reference_recurrence(spark):
    t0 = 1_700_000_000
    xs = [10.0, 20.0, 5.0, 15.0]
    rows = [(1, t0 + i, i, x) for i, x in enumerate(xs)]
    rows.append((2, t0, 99, 100.0))
    df = spark.createDataFrame(rows, "k long, sec long, eid long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "eid", "value"
    )
    from pivot_spark.operators.rolling import ewma

    out = ewma(df, ["k"], "ts", "value", alpha=0.3, order_cols=["eid"])
    got = {(r.k, r.seq): r.ewma for r in out.collect()}
    want = []
    s = None
    for x in xs:
        s = x if s is None else 0.3 * x + 0.7 * s
        want.append(s)
    for i, w in enumerate(want):
        assert got[(1, i + 1)] == pytest.approx(w, abs=1e-12)
    assert got[(2, 1)] == 100.0
    assert len(got) == 5


def test_ewma_tie_break_and_validation(spark):
    t0 = 1_700_000_000
    # same ts: eid orders the fold
    rows = [(1, t0, 2, 50.0), (1, t0, 1, 10.0)]
    df = spark.createDataFrame(rows, "k long, sec long, eid long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "eid", "value"
    )
    from pivot_spark.operators.rolling import ewma

    out = {r.seq: r.ewma for r in ewma(df, ["k"], "ts", "value", alpha=0.5, order_cols=["eid"]).collect()}
    assert out[1] == 10.0 and out[2] == 0.5 * 50.0 + 0.5 * 10.0

    with pytest.raises(ValueError):
        ewma(df, ["k"], "ts", "value", alpha=0.0)


# --- seasonal anomalies ------------------------------------------------------


def test_seasonal_anomalies_flags_outlier(spark):
    t0 = (1_700_000_000 // 86400) * 86400  # midnight
    rows = []
    # hour 0 of consecutive days: stable values + one wild outlier
    for d in range(10):
        rows.append((d, "click", t0 + d * 86400, 10.0 + (d % 2)))
    rows.append((99, "click", t0 + 10 * 86400, 1000.0))
    # hour 5: constant (sd=0 -> z NULL, not anomalous)
    rows.append((200, "view", t0 + 5 * 3600, 7.0))
    rows.append((201, "view", t0 + 86400 + 5 * 3600, 7.0))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, sec long, value double"
    ).select("event_id", "event_type", F.timestamp_seconds("sec").alias("ts"), "value")
    from pivot_spark.operators.analytics import seasonal_anomalies

    out = {r.event_id: r for r in seasonal_anomalies(df, "event_type", "ts", "value").collect()}
    assert out[99].is_anomaly is True and out[99].z > 3
    assert all(not out[i].is_anomaly for i in range(10))
    assert out[200].z is None and out[200].is_anomaly is False
    assert out[200].phase == 5

    with pytest.raises(ValueError):
        seasonal_anomalies(df, "event_type", "ts", "value", sigma=-1)
    with pytest.raises(ValueError):
        seasonal_anomalies(df, "event_type", "ts", "value", period_seconds=100, bucket_seconds=33)


# --- negative sampling -------------------------------------------------------


def test_negative_sample_k_contract(spark):
    from pivot_spark.operators.sample import negative_sample_k

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pos = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    out = negative_sample_k(ids, "doc_id", k=3, positives=pos).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor, []).append((r.neg_rank, r.negative))
        assert r.negative != r.anchor
        # positives excluded in both orientations
        assert (r.anchor, r.negative) not in [(0, 1), (1, 0), (2, 3), (3, 2)]
    assert set(by_anchor) == set(range(20))
    for a, negs in by_anchor.items():
        assert len(negs) <= 3
        assert [rk for rk, _ in sorted(negs)] == list(range(1, len(negs) + 1))

    # deterministic across invocations
    again = negative_sample_k(ids, "doc_id", k=3, positives=pos).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_sample_k_validation(spark):
    from pivot_spark.operators.sample import negative_sample_k

    ids = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        negative_sample_k(ids, "doc_id", k=0)
    with pytest.raises(ValueError):
        negative_sample_k(ids, "doc_id", k=1)  # < 2 ids


# --- perceptual hash ---------------------------------------------------------


def test_ahash_identical_and_perturbed(spark):
    from pivot_spark.operators import multimodal as M

    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base[:-5] + "cats "   # small payload change
    far = "completely different content with other bytes " * 3
    rows = [(1, base), (2, base), (3, near), (4, far)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        M.make_fake_image(F.lit(8), F.lit(8), F.encode("text", "UTF-8")).alias("image"),
    )
    h = {r.doc_id: r.ahash for r in M.ahash(df).collect()}
    assert h[1] == h[2]                      # identical payloads -> same hash
    assert h[1] != h[4]
    assert 0 <= h[1] < (1 << 60)

    pairs = {(r.id_a, r.id_b): r.hamming for r in M.ahash_pairs(df, max_hamming=5).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs or pairs[(1, 4)] > 0  # far pair absent unless trivially close


def test_ahash_pairs_exactness_vs_bruteforce(spark):
    from pivot_spark.operators import multimodal as M

    rows = [(i, f"document number {i} with shared boilerplate text body") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        M.make_fake_image(F.lit(4), F.lit(4), F.encode("text", "UTF-8")).alias("image"),
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in M.ahash_pairs(df, max_hamming=8).collect()}
    h = {r.doc_id: r.ahash for r in M.ahash(df).collect()}
    want = set()
    for a in range(12):
        for b in range(a + 1, 12):
            d = bin(h[a] ^ h[b]).count("1")
            if d <= 8:
                want.add((a, b, d))
    assert got == want

    with pytest.raises(ValueError):
        M.ahash(df, grid=64)
    with pytest.raises(ValueError):
        M.ahash_pairs(df, max_hamming=-1)


# --- SQL PIVOT parity --------------------------------------------------------


def test_sql_pivot_clause_parity(spark, sales_df):
    """The engine's pivot() and Spark SQL's native PIVOT clause agree on
    the same config (modulo the engine's extra semantics: empty-cell
    identities, default fill, error routing — which SQL PIVOT lacks)."""
    from pivot_spark import PivotConfig, pivot

    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    ours = pivot(sales_df, cfg).output
    sales_df.createOrReplaceTempView("sales_parity")
    sql = spark.sql(
        """
        SELECT * FROM (SELECT Product, Quarter, Sales FROM sales_parity)
        PIVOT (sum(Sales) AS s FOR Quarter IN ('Q1', 'Q2', 'Q3', 'Q4'))
        """
    )
    a = {tuple(r) for r in ours.collect()}
    b = {tuple(r) for r in sql.collect()}
    assert a == b
    assert ours.columns == ["Product", "Q1_s", "Q2_s", "Q3_s", "Q4_s"]


# --- Luhn card redaction -----------------------------------------------------


def test_redact_cards_luhn(spark):
    from pivot_spark.functions.redact import luhn_valid, redact_cards

    rows = [
        (1, "pay 4111 1111 1111 1111 now"),           # valid visa test number
        (2, "ref 4111111111111112 is an order id"),   # checksum fails
        (3, "mc 5500-0000-0000-0004 and visa 4111111111111111"),
        (4, "short 1234 long 12345678901234567890123"),  # no 13-19 digit run
        (5, None),
        (6, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.red for r in df.select("id", redact_cards(F.col("text")).alias("red")).collect()}
    assert out[1] == "pay <CARD> now"
    assert out[2] == "ref 4111111111111112 is an order id"   # invalid untouched
    assert out[3] == "mc <CARD> and visa <CARD>"
    assert out[4] == rows[3][1]
    assert out[5] is None
    assert out[6] == "no digits at all"

    v = df.select(luhn_valid(F.lit("4111111111111111")).alias("a"),
                  luhn_valid(F.lit("4111111111111112")).alias("b"),
                  luhn_valid(F.lit("")).alias("c")).collect()[0]
    assert (v.a, v.b, v.c) == (True, False, False)


# --- A/B analytics -----------------------------------------------------------


def test_welch_t_matches_closed_form(spark):
    import statistics

    from pivot_spark.operators.analytics import welch_t_test

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 6.0, 8.0]
    a = spark.createDataFrame([(v,) for v in xs], "v double")
    b = spark.createDataFrame([(v,) for v in ys], "v double")
    r = welch_t_test(a, b, "v").collect()[0]
    va, vb = statistics.variance(xs) / len(xs), statistics.variance(ys) / len(ys)
    t = (statistics.mean(xs) - statistics.mean(ys)) / (va + vb) ** 0.5
    dof = (va + vb) ** 2 / (va**2 / (len(xs) - 1) + vb**2 / (len(ys) - 1))
    assert (r.n_a, r.n_b) == (5, 4)
    assert r.t == round(t, 4) and r.dof == round(dof, 4)


def test_cuped_reduces_variance_preserves_mean(spark):
    import random

    from pivot_spark.operators.analytics import cuped_adjust

    rng = random.Random(3)
    rows = []
    for i in range(200):
        x = rng.gauss(10, 2)
        rows.append((i, x + rng.gauss(0, 0.5), x))  # y strongly correlates with x
    rows.append((999, 5.0, None))  # null covariate passes through
    df = spark.createDataFrame(rows, "id long, y double, x double")
    out = cuped_adjust(df, "y", "x").collect()
    ys = [r.y for r in out if r.x is not None]
    adj = [r.y_adj for r in out if r.x is not None]
    import statistics

    assert abs(statistics.mean(adj) - statistics.mean(ys)) < 1e-6
    assert statistics.variance(adj) < 0.5 * statistics.variance(ys)
    null_row = [r for r in out if r.id == 999][0]
    assert null_row.y_adj == 5.0  # unadjusted passthrough


# --- cusum -------------------------------------------------------------------


def test_cusum_matches_reference_recurrence(spark):
    t0 = 1_700_000_000
    # mean shift at index 5: CUSUM s+ should climb after it
    xs = [0.0, 1.0, -1.0, 0.5, -0.5, 10.0, 11.0, 9.0, 10.5, 10.0]
    rows = [(1, t0 + i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, sec long, eid long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "eid", "value"
    )
    from pivot_spark.operators.rolling import cusum_changepoints

    k, h = 0.5, 2.0
    out = cusum_changepoints(df, ["k"], "ts", "value", k=k, h=h, order_cols=["eid"])
    got = {r.seq: (r.s_pos, r.s_neg, r.alarm) for r in out.collect()}

    mu = sum(xs) / len(xs)
    var = sum(x * x for x in xs) / len(xs) - mu * mu
    sd = var ** 0.5
    sp = sm = 0.0
    for i, x in enumerate(xs):
        z = (x - mu) / sd
        sp = max(0.0, sp + z - k)
        sm = max(0.0, sm - z - k)
        assert got[i + 1][0] == pytest.approx(sp, abs=1e-9)
        assert got[i + 1][1] == pytest.approx(sm, abs=1e-9)
        assert got[i + 1][2] == (sp > h or sm > h)
    # the post-shift plateau must eventually alarm on the high side
    assert any(v[2] for v in got.values())


def test_cusum_zero_variance_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 1_700_000_000 + i, i, 5.0) for i in range(4)],
        "k long, sec long, eid long, value double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "eid", "value")
    from pivot_spark.operators.rolling import cusum_changepoints

    out = cusum_changepoints(df, ["k"], "ts", "value").collect()
    assert all(r.s_pos == 0.0 and r.s_neg == 0.0 and not r.alarm for r in out)
    with pytest.raises(ValueError):
        cusum_changepoints(df, ["k"], "ts", "value", k=-1.0)


# --- rfm ---------------------------------------------------------------------


def test_rfm_scores_and_boundaries(spark):
    day = 86400
    # 5 customers with strictly increasing frequency / monetary / recency
    rows = []
    for c in range(5):
        for j in range(c + 1):  # frequency 1..5
            rows.append((c, (1000 + c) * day, 100.0 * (c + 1)))
    df = spark.createDataFrame(rows, "cust long, sec long, amt double").select(
        "cust", F.timestamp_seconds("sec").alias("ts"), "amt"
    )
    from pivot_spark.operators.analytics import rfm_segments

    out = {r.cust: r for r in rfm_segments(df, "cust", "ts", "amt").collect()}
    assert len(out) == 5
    # strictly increasing metrics -> scores are the 1..5 ranks on each axis
    for c in range(5):
        r = out[c]
        assert r.frequency == c + 1
        assert r.recency_days == 4 - c
        assert (r.r_score, r.f_score, r.m_score) == (c + 1, c + 1, c + 1)
        assert r.rfm == f"{c+1}{c+1}{c+1}"
    assert out[4].monetary == pytest.approx(5 * 500.0)
