"""label_propagation + kaplan_meier."""

import math

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.analytics import kaplan_meier
from pivot_spark.operators.components import label_propagation


def test_lpa_two_cliques(spark):
    # clique {1,2,3} + clique {10,11,12}, bridged weakly by 3-10
    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iterations=3).collect()}
    assert len(out) == 6
    # each clique converges to one dominant label; cliques stay distinct
    assert out[1] == out[2]
    assert out[11] == out[12]
    assert out[1] != out[11]


def test_lpa_tie_breaks_to_smallest(spark):
    # node 2's neighbors 1 and 3 tie -> smallest label wins
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iterations=1).collect()}
    assert out[2] == 1
    with pytest.raises(ValueError):
        label_propagation(df, iterations=0)


def test_kaplan_meier_textbook(spark):
    # classic hand example: times 1(d),2(c),3(d),4(d) with n=4
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "dur double, ev int")
    out = {r.t: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert out[1.0].n_risk == 4 and out[1.0].d == 1
    assert out[1.0].survival == pytest.approx(3 / 4)
    # t=2 censored only: survival unchanged
    assert out[2.0].survival == pytest.approx(3 / 4)
    # t=3: n_risk 2, S = 3/4 * 1/2
    assert out[3.0].n_risk == 2
    assert out[3.0].survival == pytest.approx(3 / 8)
    # t=4: last subject fails -> S = 0
    assert out[4.0].n_risk == 1
    assert out[4.0].survival == 0.0
    # monotone non-increasing
    ts = sorted(out)
    for a, b in zip(ts, ts[1:]):
        assert out[b].survival <= out[a].survival + 1e-12


def test_anova_hand_computed(spark):
    # groups with clearly different means
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("b", 8.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    from pivot_spark.operators.analytics import anova_oneway

    r = anova_oneway(df, "g", "v").first()
    assert (r.k, r.n) == (2, 6)
    # SSB = 3*(2-5)^2 + 3*(8-5)^2 = 54; SSW = 2 + 2 = 4
    assert r.ssb == pytest.approx(54.0)
    assert r.ssw == pytest.approx(4.0)
    assert r.f_stat == pytest.approx((54 / 1) / (4 / 4))
    assert r.eta_sq == pytest.approx(54 / 58)
    # identical groups -> F ~ 0
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    assert anova_oneway(df2, "g", "v").first().f_stat == pytest.approx(0.0)


def test_mannwhitney_hand_computed(spark):
    from pivot_spark.operators.analytics import mannwhitney_u

    # A = {1,2,3}, B = {4,5,6}: complete separation, U_a = 0
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mannwhitney_u(df, "g", "v", "A", "B").first()
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.u_a == pytest.approx(0.0)
    assert r.u_b == pytest.approx(9.0)
    assert r.u_a + r.u_b == pytest.approx(r.n_a * r.n_b)
    assert r.z < 0  # A ranks lower
    # ties get average ranks: identical samples -> U_a = U_b, z = 0
    rows2 = [("A", 5.0), ("A", 7.0), ("B", 5.0), ("B", 7.0)]
    r2 = mannwhitney_u(
        spark.createDataFrame(rows2, "g string, v double"), "g", "v", "A", "B"
    ).first()
    assert r2.u_a == pytest.approx(r2.u_b)
    assert r2.z == pytest.approx(0.0)


def test_degree_stats_star_graph(spark):
    from pivot_spark.operators.components import degree_stats

    # star: hub 0 connected to 1..5 -> hub degree 5, leaves degree 1
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.degree: r for r in degree_stats(df).collect()}
    assert out[5].n_nodes == 1
    assert out[1].n_nodes == 5
    assert out[1].share == pytest.approx(5 / 6)
    assert out[1].max_degree == 5 and out[1].n_nodes_total == 6
    import math

    want_alpha = 1 + 6 / math.log(5)  # only the hub contributes ln d
    assert out[1].alpha == pytest.approx(want_alpha)


def test_rolling_active_users_exact_distinct(spark):
    import datetime as dt

    from pivot_spark.operators.analytics import rolling_active_users

    d0 = dt.datetime(2024, 1, 10)
    rows = []
    # user 1 active days 0 and 1; user 2 active day 1 twice (dedup);
    # user 3 active day 5 only
    rows += [(1, d0), (1, d0 + dt.timedelta(days=1))]
    rows += [(2, d0 + dt.timedelta(days=1)), (2, d0 + dt.timedelta(days=1, hours=2))]
    rows += [(3, d0 + dt.timedelta(days=5))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {r.day - rows[0][1].toordinal() + 719163: r for r in []}  # placeholder
    res = {r.day: r for r in rolling_active_users(df, "u", "ts", 7).collect()}
    days = sorted(res)
    base = days[0]
    assert res[base].dau == 1 and res[base].wau == 1
    assert res[base + 1].dau == 2
    # 7-day window ending day1 covers day0+day1 -> users {1,2}
    assert res[base + 1].wau == 2
    # window ending day5 covers days 0..5 -> users {1,2,3}
    assert res[base + 5].dau == 1 and res[base + 5].wau == 3
    assert res[base + 5].stickiness == pytest.approx(1 / 3)


def test_dispersion_poisson_vs_bursty(spark):
    import datetime as dt

    from pivot_spark.operators.analytics import dispersion_test

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    # 'steady': exactly 2 events every day for 10 days -> VMR = 0
    for i in range(10):
        rows += [("steady", d0 + dt.timedelta(days=i, hours=h)) for h in (1, 2)]
    # 'bursty': all 20 events on day 0, then silence until day 9
    rows += [("bursty", d0 + dt.timedelta(hours=h)) for h in range(20)]
    rows.append(("bursty", d0 + dt.timedelta(days=9)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r.g: r for r in dispersion_test(df, "g", "ts").collect()}
    assert out["steady"].n_buckets == 10
    assert out["steady"].vmr == pytest.approx(0.0)
    assert out["bursty"].n_buckets == 10   # zero days count
    assert out["bursty"].vmr > 5.0
    assert out["bursty"].chi2 == pytest.approx(9 * out["bursty"].vmr)
    import pytest as _pt

    with _pt.raises(ValueError):
        dispersion_test(df, "g", "ts", bucket_seconds=0)


def test_interarrival_stats(spark):
    import datetime as dt

    from pivot_spark.operators.analytics import interarrival_stats

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    # group 'reg': user 1 events every 60s exactly -> cv 0
    for i in range(5):
        rows.append(("reg", 1, d0 + dt.timedelta(seconds=60 * i), i))
    # group 'burst': gaps 1s,1s,1s,597s
    offs = [0, 1, 2, 3, 600]
    for i, o in enumerate(offs):
        rows.append(("burst", 1, d0 + dt.timedelta(seconds=o), 100 + i))
    df = spark.createDataFrame(rows, "g string, u long, ts timestamp, eid long")
    out = {r.g: r for r in interarrival_stats(df, "g", "u", "ts", "eid").collect()}
    assert out["reg"].n_gaps == 4
    assert out["reg"].mean_gap_s == pytest.approx(60.0)
    assert out["reg"].cv == pytest.approx(0.0)
    assert out["burst"].cv > 1.0
    assert out["burst"].p50_s == pytest.approx(1.0)


def test_hapax_novelty(spark):
    from pivot_spark.functions.text import hapax_novelty

    rows = [
        (1, "common common unique1"),
        (2, "common zzz1 zzz2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in hapax_novelty(df).collect()}
    # 'common' appears 3x; unique1/zzz1/zzz2 are hapax
    assert out[1].hapax_frac == pytest.approx(1 / 3)
    assert out[2].hapax_frac == pytest.approx(2 / 3)
    assert out[1].rare_frac == 1.0  # all types freq <= 10
