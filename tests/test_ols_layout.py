"""linear_regression + plan_compaction + pareto_frontier_2d."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.analytics import linear_regression
from pivot_spark.operators.layout import plan_compaction
from pivot_spark.operators.profile import pareto_frontier_2d


def test_ols_recovers_coefficients(spark):
    # y = 3 + 2*x1 - 5*x2 exactly -> R2 = 1, coefficients exact
    rows = []
    for i in range(50):
        x1, x2 = float(i % 7), float((i * 3) % 5)
        rows.append((x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = linear_regression(df, ["x1", "x2"], "y").first()
    assert r.coef[0] == pytest.approx(2.0, abs=1e-9)
    assert r.coef[1] == pytest.approx(-5.0, abs=1e-9)
    assert r.intercept == pytest.approx(3.0, abs=1e-9)
    assert r.r2 == pytest.approx(1.0, abs=1e-12)
    assert r.n == 50
    # k=3 with noise column still solves (numpy path)
    df3 = df.withColumn("x3", F.col("x1") * 0.5 + 1.0)  # collinear -> singular
    with pytest.raises(Exception):
        linear_regression(df3, ["x1", "x2", "x3"], "y").first()
    with pytest.raises(ValueError):
        linear_regression(df, [], "y")


def test_plan_compaction_bins(spark):
    rows = [("a", 900), ("b", 800), ("c", 300), ("d", 200), ("e", 100)]
    df = spark.createDataFrame(rows, "path string, size long")
    out = {r.path: r for r in plan_compaction(df, "path", "size", 1000).collect()}
    # order: a(900) b(800) c(300) d(200) e(100); cum-before: 0,900,1700,2000,2200
    assert out["a"].bin == 0
    assert out["b"].bin == 0
    assert out["c"].bin == 1
    assert out["d"].bin == 2
    assert out["e"].bin == 2
    assert out["d"].bin_bytes == 300
    # every bin except possibly the last reaches the target once started
    with pytest.raises(ValueError):
        plan_compaction(df, "path", "size", 0)


def test_pareto_frontier_small(spark):
    pts = [
        (1, 1.0, 9.0),   # frontier (max y)
        (2, 5.0, 5.0),   # frontier
        (3, 9.0, 1.0),   # frontier (max x)
        (4, 4.0, 4.0),   # dominated by 2
        (5, 5.0, 5.0),   # duplicate of 2 -> only smaller id survives
        (6, 9.0, 1.0),   # duplicate of 3
        (7, 0.5, 9.0),   # dominated by 1 (same y, smaller x)
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = sorted(r.id for r in pareto_frontier_2d(df, "x", "y", "id").collect())
    assert out == [1, 2, 3]


def test_conformal_threshold_and_coverage(spark):
    from pivot_spark.operators.analytics import conformal_threshold

    # residuals 1..100: alpha=0.1 -> k = ceil(101*0.9) = 91 -> q_hat = 91
    calib = spark.createDataFrame([(float(i),) for i in range(1, 101)], "resid double")
    test = spark.createDataFrame([(float(i),) for i in range(1, 101)], "resid double")
    r = conformal_threshold(calib, "resid", alpha=0.1, test=test).first()
    assert (r.n_calib, r.k) == (100, 91)
    assert r.q_hat == 91.0
    assert r.coverage == pytest.approx(0.91)
    import pytest as _pt

    with _pt.raises(ValueError):
        conformal_threshold(calib, "resid", alpha=0.0)


def test_lift_curve_perfect_classifier(spark):
    from pivot_spark.operators.analytics import lift_curve_ranked

    # top 20% scores are exactly the positives -> bins 1-2 capture all
    rows = [(i, float(100 - i), 1.0 if i < 20 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, label double")
    out = {r.bin: r for r in lift_curve_ranked(df, "score", "label", "id").collect()}
    assert len(out) == 10
    assert all(out[b].n == 10 for b in out)
    assert out[1].n_pos == 10 and out[2].n_pos == 10
    assert out[1].lift == pytest.approx(1 / 0.2)
    assert out[2].cum_pos_share == pytest.approx(1.0)
    assert out[10].n_pos == 0
    assert out[10].cum_pop_share == pytest.approx(1.0)


def test_row_rank_is_permutation(spark):
    from pivot_spark.operators.profile import row_rank
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, float(i % 17)) for i in range(2000)], "id long, v double")
    ranked = row_rank(df, [F.col("v").desc(), F.col("id")], out_col="r")
    rs = sorted(r.r for r in ranked.collect())
    assert rs == list(range(1, 2001))


def test_auc_and_ap_hand_computed(spark):
    from pivot_spark.operators.analytics import average_precision, binary_auc

    # perfect separation -> AUC 1, AP 1
    rows = [(i, float(i), 1.0 if i >= 5 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, label double")
    r = binary_auc(df, "score", "label").first()
    assert (r.n_pos, r.n_neg) == (5, 5)
    assert r.auc == pytest.approx(1.0)
    assert average_precision(df, "score", "label", "id").first().ap == pytest.approx(1.0)

    # random-ish interleave: compute AUC by brute force pair counting
    rows2 = [(0, 1.0, 0.0), (1, 2.0, 1.0), (2, 2.0, 0.0), (3, 3.0, 1.0), (4, 0.5, 0.0)]
    df2 = spark.createDataFrame(rows2, "id long, score double, label double")
    pos = [r[1] for r in rows2 if r[2] == 1.0]
    neg = [r[1] for r in rows2 if r[2] == 0.0]
    brute = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))
    r2 = binary_auc(df2, "score", "label").first()
    assert r2.auc == pytest.approx(brute)

    # AP by hand on (score desc, id): order 3(+), 1(+), 2(-), 0(-), 4(-)
    ap = (1 / 1 + 2 / 2) / 2
    assert average_precision(df2, "score", "label", "id").first().ap == pytest.approx(ap)


def test_vocab_richness_hand_computed(spark):
    from pivot_spark.operators.profile import vocab_richness

    # corpus: a a a b b c d -> N=7, D=4, f1=2 (c,d), f2=1 (b)
    df = spark.createDataFrame([("a a a b b",), ("c d",)], "text string")
    r = vocab_richness(df, "text").first()
    assert (r.n_tokens, r.n_types, r.f1, r.f2) == (7, 4, 2, 1)
    assert r.chao1 == pytest.approx(4 + 4 / 2)
    assert r.p_unseen == pytest.approx(2 / 7)
    assert r.ttr == pytest.approx(4 / 7)
    import math

    assert r.herdan_c == pytest.approx(math.log(4) / math.log(7))
    # f2 = 0 -> bias-corrected form
    df2 = spark.createDataFrame([("x y z",)], "text string")
    r2 = vocab_richness(df2, "text").first()
    assert r2.chao1 == pytest.approx(3 + 3 * 2 / 2)


def test_brier_decomposition_identity(spark):
    from pivot_spark.operators.analytics import brier_decomposition

    rows = [(0.1, 0.0), (0.1, 0.0), (0.1, 1.0), (0.8, 1.0), (0.8, 1.0), (0.8, 0.0)]
    df = spark.createDataFrame(rows, "score double, label double")
    r = brier_decomposition(df, "score", "label").first()
    bs = sum((s - y) ** 2 for s, y in rows) / len(rows)
    assert r.brier == pytest.approx(bs)
    # Murphy identity holds exactly for bin-constant scores
    assert r.brier == pytest.approx(
        r.reliability - r.resolution + r.uncertainty, abs=1e-12
    )
    assert r.base_rate == pytest.approx(0.5)
    assert r.uncertainty == pytest.approx(0.25)


def test_weighted_quantile_hand_computed(spark):
    from pivot_spark.operators.profile import weighted_quantile

    # values 1..4 with weights 1,1,1,7 -> half the mass sits on value 4
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)], "v double, w double"
    )
    out = {r.prob: r for r in weighted_quantile(df, "v", "w", [0.3, 0.5, 0.99]).collect()}
    assert out[0.3].value == 3.0   # cum 3 >= 0.3*10
    assert out[0.5].value == 4.0
    assert out[0.99].value == 4.0
    assert out[0.5].total_weight == pytest.approx(10.0)
    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_quantile(df, "v", "w", [0.0])
