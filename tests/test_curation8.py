"""calibration_report + temperature_mixture_rates + remove_duplicated_spans."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.classifier import calibration_report
from pivot_spark.operators.sample import temperature_mixture_rates
from pivot_spark.operators.spans import remove_duplicated_spans


def test_calibration_hand_computed(spark):
    # bin 0.0-0.5 (well calibrated-ish), bin 0.5-1.0 (overconfident)
    rows = [
        (0.2, 0.0), (0.3, 1.0),          # bin 2/3: mean .2 pos 0; .3 pos 1
        (0.9, 0.0), (0.95, 1.0),         # bin 9: mean .925, pos .5
        (1.0, 1.0),                      # score 1.0 clamps into bin 9
    ]
    df = spark.createDataFrame(rows, "score double, label double")
    out = {r.bin: r for r in calibration_report(df, "score", "label", n_bins=10).collect()}
    assert set(out) == {2, 3, 9}
    assert out[9].n == 3
    assert out[9].mean_score == pytest.approx((0.9 + 0.95 + 1.0) / 3)
    assert out[9].pos_rate == pytest.approx(2 / 3)
    assert out[2].bin_lo == pytest.approx(0.2)
    # ece = sum share*|gap| — same on every row
    w = sum(r.n * abs(r.pos_rate - r.mean_score) for r in out.values())
    assert out[2].ece == pytest.approx(w / 5)
    assert out[2].ece == out[9].ece
    with pytest.raises(ValueError):
        calibration_report(df, "score", "label", n_bins=1)


def test_temperature_mixture_properties(spark):
    rows = [("en", 900.0), ("fr", 90.0), ("zh", 10.0)]
    df = spark.createDataFrame(rows, "lang string, w double")
    # alpha=1 -> proportional (target == share)
    out1 = {r.stratum: r for r in temperature_mixture_rates(df, "lang", "w", alpha=1.0).collect()}
    for r in out1.values():
        assert r.target_share == pytest.approx(r.share)
    # alpha=0.3 -> tail flattened: zh target share rises, en falls
    out3 = {r.stratum: r for r in temperature_mixture_rates(df, "lang", "w", alpha=0.3).collect()}
    assert out3["zh"].target_share > out3["zh"].share
    assert out3["en"].target_share < out3["en"].share
    assert sum(r.target_share for r in out3.values()) == pytest.approx(1.0)
    # budget: rates capped at 1, quota-limited strata downsampled
    outb = {r.stratum: r for r in
            temperature_mixture_rates(df, "lang", "w", alpha=0.3, budget=100.0).collect()}
    for r in outb.values():
        assert 0.0 < r.keep_rate <= 1.0
    assert outb["en"].keep_rate == pytest.approx(
        min(1.0, out3["en"].target_share * 100.0 / 900.0)
    )
    with pytest.raises(ValueError):
        temperature_mixture_rates(df, "lang", "w", alpha=0.0)
    with pytest.raises(ValueError):
        temperature_mixture_rates(df, "lang", "w", budget=-1.0)


def test_remove_dup_spans_keep_first(spark):
    shared = "alpha beta gamma delta epsilon"           # exactly one 5-gram
    rows = [
        (1, "intro " + shared + " outro"),              # first occurrence kept
        (2, shared + " tail words here"),               # loses the span
        (3, "clean doc with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, k=5).collect()}
    assert out[1].text == "intro " + shared + " outro"
    assert out[1].n_removed == 0
    assert out[2].text == "tail words here"
    assert out[2].n_removed == 5
    assert out[3].text == "clean doc with no repeats at all"
    assert out[3].n_tokens == 7 and out[3].n_removed == 0
    # within-doc repeat: second copy removed
    df2 = spark.createDataFrame(
        [(1, shared + " mid " + shared)], "doc_id long, text string"
    )
    r2 = remove_duplicated_spans(df2, k=5).collect()[0]
    assert r2.text == shared + " mid"
    assert r2.n_removed == 5
    with pytest.raises(ValueError):
        remove_duplicated_spans(df, k=1)


def test_strip_boilerplate_lines(spark):
    from pivot_spark.operators.quality import strip_boilerplate_lines

    # source A: 4 docs; "footer A" in all 4 (frac 1.0 -> stripped),
    # "promo" in 2 of 4 (frac 0.5 < 0.6 -> kept). source B: 1 doc;
    # its banner appears once (min_docs=2 blocks single-doc sources).
    rows = [
        (1, "A", "alpha one\nfooter A\npromo"),
        (2, "A", "beta two\nfooter A\npromo"),
        (3, "A", "gamma three\nfooter A"),
        (4, "A", "delta four\nfooter A"),
        (5, "B", "epsilon five\nbanner B"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {
        r.doc_id: r
        for r in strip_boilerplate_lines(df, min_frac=0.6, min_docs=2).collect()
    }
    assert out[1].clean_text == "alpha one\npromo"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert out[3].clean_text == "gamma three"
    assert out[5].clean_text == "epsilon five\nbanner B"
    assert out[5].n_removed == 0


def test_strip_boilerplate_lines_drops_all(spark):
    from pivot_spark.operators.quality import strip_boilerplate_lines

    rows = [(1, "A", "same"), (2, "A", "same")]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r.doc_id: r for r in strip_boilerplate_lines(df).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 1


def test_strip_boilerplate_lines_validates():
    import pytest as _pt

    from pivot_spark.operators.quality import strip_boilerplate_lines

    with _pt.raises(ValueError):
        strip_boilerplate_lines(None, min_frac=0.0)
    with _pt.raises(ValueError):
        strip_boilerplate_lines(None, min_docs=0)


def test_normalize_unicode(spark):
    from pyspark.sql import functions as F

    from pivot_spark.functions.text import normalize_unicode

    rows = [
        (1, "\u201Chello\u201D \u2014 world\u2026"),
        (2, "a\u200Bb c \u00A0\t d\u0007 e"),
        (3, "  plain  "),
        (4, "it\u2019s \u2013 fine"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {
        r.id: r.n
        for r in df.select(
            "id", normalize_unicode(F.col("t")).alias("n")
        ).collect()
    }
    assert out[1] == '"hello" - world...'
    assert out[2] == "ab c d e"
    assert out[3] == "plain"
    assert out[4] == "it's - fine"
