"""duplicated_spans (exact-substring dedup) + repetition_runs."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.spans import duplicated_spans, repetition_runs


def test_duplicated_spans_cross_doc(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens, shared
    rows = [
        (1, "one two " + shared + " three four"),          # span at 3..8
        (2, shared + " five six seven"),                   # span at 1..6
        (3, "unique tokens only here nothing repeats"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicated_spans(df, k=5).collect()}
    assert set(out) == {1, 2}
    # doc 1: dup windows at 3 and 4 (both 5-gram windows inside shared)
    assert (out[1].span_start, out[1].span_end, out[1].span_tokens) == (3, 8, 6)
    assert (out[2].span_start, out[2].span_end, out[2].span_tokens) == (1, 6, 6)


def test_duplicated_spans_merge_and_gap(spark):
    s1 = "a1 a2 a3 a4 a5"
    s2 = "b1 b2 b3 b4 b5"
    rows = [
        (1, s1 + " " + s2),                     # adjacent dup spans -> merged
        (2, s1 + " x y z w v u t s " + s2),     # gap > k -> two spans
        (3, s1),                                # partners
        (4, s2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_spans(df, k=5).collect()
    d1 = [r for r in out if r.doc_id == 1]
    assert len(d1) == 1 and (d1[0].span_start, d1[0].span_end) == (1, 10)
    d2 = sorted(
        [(r.span_start, r.span_end) for r in out if r.doc_id == 2]
    )
    assert d2 == [(1, 5), (14, 18)]
    with pytest.raises(ValueError):
        duplicated_spans(df, k=1)


def test_repetition_runs(spark):
    rows = [
        (1, "the the the cat"),        # p1 run = 2 (two consecutive matches)
        (2, "a b a b a b end"),        # p2 run = 4 (positions 3..6 match i-2)
        (3, "x y z"),                  # no repeats
        (4, "solo"),                   # shorter than period 2
        (5, ""),                       # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_runs(df, max_period=2).collect()}
    assert out[1].run_p1 == 2 and out[1].run_p2 == 1  # 'the'(3) == 'the'(1)
    assert out[2].run_p1 == 0 and out[2].run_p2 == 4
    assert out[3].run_p1 == 0 and out[3].run_p2 == 0
    assert out[4].n_tokens == 1 and out[4].run_p1 == 0 and out[4].run_p2 == 0
    assert out[5].n_tokens == 0 and out[5].run_p1 == 0
    with pytest.raises(ValueError):
        repetition_runs(df, max_period=0)


def test_dedup_savings_report(spark):
    from pivot_spark.operators.spans import dedup_savings_report

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, "web", "intro " + shared + " outro"),   # keeps the span (first)
        (2, "web", shared + " tail words here"),    # loses 5 tokens
        (3, "book", "totally clean document four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in dedup_savings_report(df).collect()}
    assert out["web"].n_docs == 2
    assert out["web"].raw_tokens == 7 + 8
    assert out["web"].removed_tokens == 5
    assert out["web"].effective_tokens == 10
    assert out["web"].savings_frac == pytest.approx(5 / 15)
    assert out["book"].removed_tokens == 0
    assert out["book"].savings_frac == 0.0
