"""Token-entropy unit tests (operators/repetition.py token_entropy)."""

import math

import pytest

from pivot_spark.operators.repetition import token_entropy


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.doc_id: r for r in token_entropy(df).collect()}


def test_uniform_tokens_max_entropy(spark):
    r = _run(spark, [(1, "a b c d")])
    assert r[1].token_entropy == pytest.approx(round(math.log(4), 4))
    assert r[1].entropy_ratio == 1.0


def test_single_repeated_token_zero_entropy(spark):
    r = _run(spark, [(2, "spam spam spam spam")])
    assert r[2].token_entropy == 0.0 and r[2].entropy_ratio == 0.0
    assert r[2].n_tokens == 4


def test_skewed_distribution(spark):
    # 3x 'a', 1x 'b' -> H = -(0.75 ln 0.75 + 0.25 ln 0.25)
    r = _run(spark, [(3, "a a a b")])
    expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r[3].token_entropy == pytest.approx(round(expect, 4))
    assert 0 < r[3].entropy_ratio < 1


def test_empty_and_single_token(spark):
    r = _run(spark, [(4, ""), (5, "word")])
    assert r[4].n_tokens == 0 and r[4].token_entropy == 0.0 and r[4].entropy_ratio == 0.0
    assert r[5].n_tokens == 1 and r[5].token_entropy == 0.0 and r[5].entropy_ratio == 0.0


def test_case_insensitive(spark):
    a = _run(spark, [(6, "The the THE cat")])
    assert a[6].token_entropy == pytest.approx(
        round(-(0.75 * math.log(0.75) + 0.25 * math.log(0.25)), 4)
    )


def test_every_doc_emitted(spark):
    r = _run(spark, [(1, "x"), (2, ""), (3, "y z")])
    assert set(r) == {1, 2, 3}
