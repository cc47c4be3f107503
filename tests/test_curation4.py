"""Unit tests: z-score normalization, batched BM25."""

import pytest

from pivot_spark.operators.bm25 import bm25_topk, bm25_topk_batch
from pivot_spark.operators.bucketize import zscore_normalize


def test_zscore_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], "g string, v double"
    )
    out = {(r.g, r.v): r.z for r in zscore_normalize(df, ["g"], "v").collect()}
    # group a: mean 2, stddev_pop 1 -> z = -1, 1
    assert out[("a", 1.0)] == -1.0 and out[("a", 3.0)] == 1.0
    # zero-variance group -> 0
    assert out[("b", 5.0)] == 0.0


def test_zscore_broadcast_no_fact_shuffle(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    plan = zscore_normalize(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


DOCS = [
    (1, "spark shuffle join spark spark"),
    (2, "hash join merge"),
    (3, "the quick brown fox"),
    (4, "spark hash"),
]


def test_batch_matches_single_query(spark):
    """Per-query results equal the single-query operator for docs that
    contain >= 1 term (batch skips no-match docs, single emits 0s)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    q = spark.createDataFrame(
        [(10, ["spark", "join"]), (20, ["hash"])], "query_id int, terms array<string>"
    )
    batch = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk_batch(docs, q, k=4).collect()
    }
    for qid, terms in [(10, ["spark", "join"]), (20, ["hash"])]:
        single = {
            r.doc_id: r.score for r in bm25_topk(docs, terms, k=4).collect() if r.score > 0
        }
        got = {d: s for (qq, d), (s, _) in batch.items() if qq == qid}
        assert got == pytest.approx(single)


def test_batch_ranks_within_query(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    q = spark.createDataFrame([(1, ["spark"])], "query_id int, terms array<string>")
    rows = sorted(bm25_topk_batch(docs, q, k=10).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].doc_id == 1  # tf=3 wins
    assert {r.doc_id for r in rows} == {1, 4}  # only docs containing 'spark'


def test_batch_k_caps_per_query(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    q = spark.createDataFrame([(1, ["spark"]), (2, ["join"])], "query_id int, terms array<string>")
    out = bm25_topk_batch(docs, q, k=1)
    per = {r.query_id for r in out.collect()}
    assert out.count() == 2 and per == {1, 2}


def test_batch_empty_corpus_raises(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    q = spark.createDataFrame([(1, ["x"])], "query_id int, terms array<string>")
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, q)
