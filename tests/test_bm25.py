"""BM25 retrieval unit tests (operators/bm25.py)."""

import math

import pytest

from pivot_spark.operators.bm25 import bm25_topk

DOCS = [
    (1, "spark shuffle join spark spark"),
    (2, "hash join merge"),
    (3, "the quick brown fox"),
    (4, "spark hash"),
]


def _expected_scores(query, k1=1.2, b=0.75):
    corpus = {i: t.lower().split() for i, t in DOCS}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    out = {}
    for i, toks in corpus.items():
        s = 0.0
        for t in query:
            df = sum(1 for v in corpus.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tf = toks.count(t)
            s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl)))
        out[i] = round(s, 4)
    return out


def test_scores_match_reference_formula(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.score for r in bm25_topk(df, ["spark", "join"], k=4).collect()}
    assert got == pytest.approx(_expected_scores(["spark", "join"]))


def test_ranking_and_tiebreak(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["spark"], k=4).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4]
    # doc 1 has tf=3 -> top; docs 2,3 score 0 and tie -> id order
    assert rows[0].doc_id == 1
    zero = [r.doc_id for r in rows if r.score == 0.0]
    assert zero == sorted(zero)


def test_absent_term_scores_zero_everywhere(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["zzz"], k=4).collect()
    assert all(r.score == 0.0 for r in rows)


def test_k_limits_output(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert bm25_topk(df, ["spark"], k=2).count() == 2


def test_empty_query_raises(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(df, [], k=2)


def test_query_terms_lowercased(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = {r.doc_id: r.score for r in bm25_topk(df, ["SPARK"], k=4).collect()}
    b = {r.doc_id: r.score for r in bm25_topk(df, ["spark"], k=4).collect()}
    assert a == b
