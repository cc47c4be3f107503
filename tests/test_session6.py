"""Session-6 operators: Bradley–Terry preference strengths, MinHash
estimator audit, cross-source quantile calibration, PPM contrast
stretch, held-out Stupid-Backoff LM scoring."""

import math

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# preference.py
# --------------------------------------------------------------------------

def test_pairwise_wins_exact_integer_decisions(spark):
    # u1: A(2.0, 2.0) beats B(1.0); u2: tie A(3.0) vs B(3.0) -> excluded
    rows = [
        ("u1", "A", 2.0), ("u1", "A", 2.0), ("u1", "B", 1.0),
        ("u2", "A", 3.0), ("u2", "B", 3.0),
        ("u3", "B", 5.0), ("u3", "A", 1.0),
    ]
    df = spark.createDataFrame(rows, ["subj", "item", "v"])
    from pivot_spark.operators.preference import pairwise_wins

    out = pairwise_wins(df, "subj", "item", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("A", "B")
    assert r["n"] == 2 and r["wins_a"] == 1 and r["wins_b"] == 1


def test_bradley_terry_orders_by_true_strength(spark):
    # A beats B 9:1, B beats C 9:1, A beats C 10:0 -> p_A > p_B > p_C
    rows = []
    for i in range(9):
        rows.append((f"ab{i}", "A", 1.0)), rows.append((f"ab{i}", "B", 0.0))
    rows.append(("ab9", "B", 1.0)), rows.append(("ab9", "A", 0.0))
    for i in range(9):
        rows.append((f"bc{i}", "B", 1.0)), rows.append((f"bc{i}", "C", 0.0))
    rows.append(("bc9", "C", 1.0)), rows.append(("bc9", "B", 0.0))
    for i in range(10):
        rows.append((f"ac{i}", "A", 1.0)), rows.append((f"ac{i}", "C", 0.0))
    df = spark.createDataFrame(rows, ["subj", "item", "v"])
    from pivot_spark.operators.preference import bradley_terry_from_scores

    out = {r["item"]: r for r in bradley_terry_from_scores(
        df, "subj", "item", "v").collect()}
    assert out["A"]["strength"] > out["B"]["strength"] > out["C"]["strength"]
    # mean-1 normalization
    mean = sum(r["strength"] for r in out.values()) / 3
    assert abs(mean - 1.0) < 1e-9
    assert out["A"]["n_comparisons"] == 20
    # smoothing: wins include the +0.5 pseudo-count per pair direction
    assert out["A"]["wins"] == pytest.approx(9 + 0.5 + 10 + 0.5)


def test_bradley_terry_max_items_guard(spark):
    rows = [("s", f"i{k}", float(k % 3)) for k in range(6)]
    df = spark.createDataFrame(rows, ["subj", "item", "v"])
    from pivot_spark.operators.preference import bradley_terry_from_scores

    with pytest.raises(ValueError, match="max_items"):
        bradley_terry_from_scores(df, "subj", "item", "v", max_items=2)


def test_bradley_terry_winless_item_stays_positive(spark):
    rows = [(f"s{i}", "A", 1.0) for i in range(5)]
    rows += [(f"s{i}", "B", 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["subj", "item", "v"])
    from pivot_spark.operators.preference import bradley_terry_from_scores

    out = {r["item"]: r["strength"] for r in bradley_terry_from_scores(
        df, "subj", "item", "v").collect()}
    assert out["B"] > 0.0  # smoothing keeps the winless item positive
    assert out["A"] > out["B"]


# --------------------------------------------------------------------------
# calibrate.py
# --------------------------------------------------------------------------

def test_quantile_normalize_uniform_within_group(spark):
    rows = [("a", i, float(i * 10)) for i in range(5)]
    rows += [("b", 100 + i, float(1000 + i)) for i in range(3)]
    rows += [("c", 200, 7.0)]  # singleton group -> 0.5
    df = spark.createDataFrame(rows, ["src", "id", "score"])
    from pivot_spark.operators.calibrate import quantile_normalize

    out = quantile_normalize(df, "score", ["src"], "id", keep_top=0.4)
    got = {(r["src"], r["id"]): (r["q_norm"], r["keep"]) for r in out.collect()}
    assert got[("a", 0)][0] == 0.0 and got[("a", 4)][0] == 1.0
    assert got[("a", 2)][0] == pytest.approx(0.5)
    assert got[("b", 100)][0] == 0.0 and got[("b", 102)][0] == 1.0
    assert got[("c", 200)][0] == 0.5
    # keep: top 40% of each group (q_norm > 0.6)
    assert got[("a", 4)][1] and got[("a", 3)][1] and not got[("a", 2)][1]
    assert got[("b", 102)][1] and not got[("b", 101)][1]
    assert not got[("c", 200)][1]


def test_quantile_normalize_drops_nulls_and_ties_deterministic(spark):
    rows = [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, None), (None, 4, 1.0)]
    df = spark.createDataFrame(rows, ["src", "id", "score"])
    from pivot_spark.operators.calibrate import quantile_normalize

    out = quantile_normalize(df, "score", ["src"], "id").collect()
    got = {r["id"]: r["q_norm"] for r in out}
    assert set(got) == {1, 2}
    assert got[1] == 0.0 and got[2] == 1.0  # tie broken by id


# --------------------------------------------------------------------------
# neardup.py::minhash_estimate_report
# --------------------------------------------------------------------------

def test_minhash_estimate_report_identical_and_disjoint(spark):
    # ids 0 and 10 identical (est=1, true=1); 0 vs 20 disjoint (0, 0)
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (10, "alpha beta gamma delta epsilon zeta"),
        (20, "one two three four five six seven"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pivot_spark.operators.neardup import minhash_estimate_report

    out = {r["bucket"]: r for r in minhash_estimate_report(
        df, num_hashes=16, sample_size=None).collect()}
    # bucket 9: the identical pair; bucket 0: the two disjoint pairs
    assert out[9]["n_pairs"] == 1
    assert out[9]["mean_est"] == 1.0 and out[9]["mean_true"] == 1.0
    assert out[9]["mean_abs_err"] == 0.0
    assert out[0]["n_pairs"] == 2
    assert out[0]["mean_true"] == 0.0


def test_minhash_estimate_report_error_bounded(spark):
    # half-overlapping docs: est within a few binomial sd of true
    base = "w%d " * 30
    rows = [
        (0, " ".join(f"a{i}" for i in range(40))),
        (1, " ".join(f"a{i}" for i in range(20, 60))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pivot_spark.operators.neardup import minhash_estimate_report

    out = minhash_estimate_report(df, num_hashes=16, sample_size=None).collect()
    assert len(out) == 1
    r = out[0]
    t = r["mean_true"]
    sd = math.sqrt(t * (1 - t) / 16)
    assert r["mean_abs_err"] <= 4 * sd + 1e-9


def test_minhash_estimate_report_rejects_bad_k(spark):
    df = spark.createDataFrame([(0, "x y z")], ["doc_id", "text"])
    from pivot_spark.operators.neardup import minhash_estimate_report

    with pytest.raises(ValueError, match="divide"):
        minhash_estimate_report(df, num_hashes=7)




def test_minhash_estimate_report_pair_guards(spark):
    rows = [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pivot_spark.operators.neardup import minhash_estimate_report

    # static guard: sample_size alone bounds the pair stage
    with pytest.raises(ValueError, match="max_pairs"):
        minhash_estimate_report(df, num_hashes=16, sample_size=100, max_pairs=10)
    # dynamic guard: sample_size=None counts the frame before pairing
    with pytest.raises(ValueError, match="max_pairs"):
        minhash_estimate_report(df, num_hashes=16, sample_size=None, max_pairs=10)
    # bounded draw: only sample_size ids enter the pair stage, and the
    # md5 top-k draw is deterministic across invocations
    a = minhash_estimate_report(df, num_hashes=16, sample_size=4).collect()
    b = minhash_estimate_report(df, num_hashes=16, sample_size=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["n_pairs"] for r in a) == 6  # C(4,2)


# --------------------------------------------------------------------------
# codecs.py::ppm_contrast_stretch
# --------------------------------------------------------------------------

def _img_df(spark, rows):
    from pivot_spark.operators.codecs import make_ppm

    df = spark.createDataFrame(rows, ["doc_id", "w", "h", "payload"])
    return df.select(
        "doc_id",
        make_ppm(
            F.col("w").cast("int"), F.col("h").cast("int"),
            F.encode("payload", "UTF-8"),
        ).alias("image"),
    )


def test_ppm_contrast_stretch_flat_image_is_500(spark):
    df = _img_df(spark, [(1, 2, 2, "xxx" * 4)])
    from pivot_spark.operators.codecs import ppm_contrast_stretch

    r = ppm_contrast_stretch(df).collect()[0]
    assert r["contrast"] == 0.0
    assert r["stretch_sum"] == 4 * 500
    assert r["stretch_sumsq"] == 4 * 500 * 500


def test_ppm_contrast_stretch_full_range(spark):
    # pixel lumas: 0x00*3 -> 0, 0xff*3 -> 255000: lo=0, hi=255000
    from pivot_spark.operators.codecs import make_ppm

    payload = bytearray(b"\x00" * 3 + b"\xff" * 3 + b"\x00" * 3 + b"\xff" * 3)
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"]).select(
        "doc_id",
        make_ppm(F.lit(2).cast("int"), F.lit(2).cast("int"),
                 F.col("payload")).alias("image"),
    )
    from pivot_spark.operators.codecs import ppm_contrast_stretch

    r = ppm_contrast_stretch(df).collect()[0]
    assert r["luma_lo"] == 0.0 and r["luma_hi"] == 255.0
    assert r["contrast"] == 1.0
    # stretched: two at 0, two at 1000
    assert r["stretch_sum"] == 2000 and r["stretch_sumsq"] == 2 * 1000 * 1000


def test_ppm_contrast_stretch_exact_rounding(spark):
    # lumas: 'a'=97 -> 97000, 'b'=98 -> 98000, 'c'=99 -> 99000, 'd' -> 100000
    payload = "aaabbbcccddd"
    df = _img_df(spark, [(1, 2, 2, payload)])
    from pivot_spark.operators.codecs import ppm_contrast_stretch

    r = ppm_contrast_stretch(df).collect()[0]
    lo, hi = 97000, 100000
    exp = [((v - lo) * 2000 + (hi - lo)) // (2 * (hi - lo))
           for v in (97000, 98000, 99000, 100000)]
    assert r["stretch_sum"] == sum(exp)
    assert r["stretch_sumsq"] == sum(v * v for v in exp)
    assert r["n_px"] == 4


def test_ppm_contrast_stretch_invalid_blob_nulls(spark):
    df = spark.createDataFrame([(1, bytearray(b"nonsense"))],
                               ["doc_id", "image"])
    from pivot_spark.operators.codecs import ppm_contrast_stretch

    r = ppm_contrast_stretch(df).collect()[0]
    assert r["stretch_sum"] is None and r["contrast"] is None


# --------------------------------------------------------------------------
# lm.py::stupid_backoff_score
# --------------------------------------------------------------------------

def test_stupid_backoff_seen_vs_backoff(spark):
    train = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(1, "the cat"), (3, "cat the")], ["doc_id", "text"]
    )
    from pivot_spark.operators.lm import stupid_backoff_score

    out = {r["doc_id"]: r for r in stupid_backoff_score(
        train, score, vocab_size=100, alpha=0.4).collect()}
    # "the cat": seen bigram, c(the cat)=2, c(the)=2 -> S=1 -> -ln 1 = 0
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_neg_logs"] == pytest.approx(0.0, abs=1e-9)
    # "cat the": unseen -> backoff 0.4 * c(the)/N = 0.4 * 2/6
    assert out[3]["avg_neg_logs"] == pytest.approx(
        round(-math.log(0.4 * 2 / 6), 4), abs=2e-4)


def test_stupid_backoff_oov_floors_at_one(spark):
    train = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(1, "zz qq")], ["doc_id", "text"])
    from pivot_spark.operators.lm import stupid_backoff_score

    out = stupid_backoff_score(train, score, vocab_size=10).collect()[0]
    # zz/qq unseen even as <unk> (train has no OOV): c(b) floors at 1
    assert out["n_bigrams"] == 1
    assert out["avg_neg_logs"] == pytest.approx(
        round(-math.log(0.4 * 1 / 2), 4), abs=2e-4)


def test_stupid_backoff_short_docs_null(spark):
    train = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(1, "solo"), (3, "")], ["doc_id", "text"])
    from pivot_spark.operators.lm import stupid_backoff_score

    out = {r["doc_id"]: r for r in stupid_backoff_score(train, score).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["avg_neg_logs"] is None
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_neg_logs"] is None


# --------------------------------------------------------------------------
# analytics.py::cohens_kappa
# --------------------------------------------------------------------------

def test_cohens_kappa_perfect_and_chance(spark):
    from pivot_spark.operators.analytics import cohens_kappa

    rows = [("x", "x")] * 3 + [("y", "y")] * 3
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] == 1.0 and r["po"] == 1.0 and r["agree"] == 6

    # independent labels at uniform 50/50: kappa == 0 exactly
    rows = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 0.5 and r["pe"] == 0.5 and r["kappa"] == 0.0


def test_cohens_kappa_known_value(spark):
    from pivot_spark.operators.analytics import cohens_kappa

    # classic 2x2: a=20,b=5 / c=10,d=15 -> po=0.7, pe=(30*25+20*25)/2500=0.5
    rows = ([("p", "p")] * 20 + [("p", "n")] * 5
            + [("n", "p")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 0.7 and r["pe"] == 0.5
    assert r["kappa"] == pytest.approx(0.4)


def test_cohens_kappa_degenerate_constant(spark):
    from pivot_spark.operators.analytics import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 4, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["pe"] == 1.0 and r["kappa"] is None


def test_cohens_kappa_drops_nulls(spark):
    from pivot_spark.operators.analytics import cohens_kappa

    df = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "y")], ["a", "b"]
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 1


# --------------------------------------------------------------------------
# coreset.py::farthest_point_sample
# --------------------------------------------------------------------------

def test_fps_picks_spread_points(spark):
    # three tight clusters on a line; k=3 must take one from each
    pts = [(0, [0.0, 0.0]), (1, [0.1, 0.0]),
           (10, [10.0, 0.0]), (11, [10.1, 0.0]),
           (20, [20.0, 0.0]), (21, [20.1, 0.0])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts], ["vec_id", "embedding"]
    )
    from pivot_spark.operators.coreset import farthest_point_sample

    out = farthest_point_sample(df, k=3).collect()
    assert [r["step"] for r in out] == [0, 1, 2]
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 0           # deterministic start: smallest id
    assert ids[1] in (20, 21)    # farthest cluster next
    assert ids[2] in (10, 11)    # middle cluster last
    assert out[0]["min_dist"] is None and out[1]["min_dist"] > 0


def test_fps_duplicates_not_repicked_and_short_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    from pivot_spark.operators.coreset import farthest_point_sample

    out = farthest_point_sample(df, k=5).collect()
    assert [r["vec_id"] for r in out] == [0, 1]  # stops at corpus size
    assert out[1]["min_dist"] == 0.0


def test_fps_tie_breaks_to_smallest_id(spark):
    df = spark.createDataFrame(
        [(3, [0.0]), (7, [1.0]), (5, [1.0])], ["vec_id", "embedding"]
    )
    from pivot_spark.operators.coreset import farthest_point_sample

    out = farthest_point_sample(df, k=2).collect()
    assert out[0]["vec_id"] == 3 and out[1]["vec_id"] == 5
