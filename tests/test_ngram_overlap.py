"""n-gram decontamination unit tests (operators/ngram_overlap.py)."""

from pivot_spark.operators.ngram_overlap import ngram_overlap, word_ngram_hashes

import pyspark.sql.functions as F

BENCH_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _run(spark, corpus_rows, k=3, threshold=0.8):
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(100, BENCH_TEXT)], ["doc_id", "text"])
    out = ngram_overlap(corpus, bench, "doc_id", "text", k=k, threshold=threshold)
    return {r.doc_id: r for r in out.collect()}


def test_exact_copy_fully_contaminated(spark):
    r = _run(spark, [(1, BENCH_TEXT)])
    assert r[1].overlap_frac == 1.0 and r[1].contaminated


def test_disjoint_doc_scores_zero(spark):
    r = _run(spark, [(2, "completely unrelated words about spark engines")])
    assert r[2].overlap_frac == 0.0 and not r[2].contaminated


def test_partial_embedding_detected(spark):
    # benchmark sentence embedded in novel surrounding text
    r = _run(spark, [(3, "intro words first " + BENCH_TEXT + " closing remark here")])
    assert 0.0 < r[3].overlap_frac < 1.0
    # the embedded span contributes all benchmark grams
    assert r[3].n_overlap == len(BENCH_TEXT.split()) - 3 + 1


def test_short_doc_single_gram(spark):
    # fewer words than k -> one gram of the whole doc
    r = _run(spark, [(4, "the quick")], k=3)
    assert r[4].n_grams == 1 and r[4].overlap_frac == 0.0
    # identical short doc vs short benchmark matches
    corpus = spark.createDataFrame([(5, "tiny doc")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    row = ngram_overlap(corpus, bench, k=3).collect()[0]
    assert row.overlap_frac == 1.0


def test_empty_text_scores_zero(spark):
    r = _run(spark, [(6, "")])
    assert r[6].n_grams == 0 and r[6].overlap_frac == 0.0 and not r[6].contaminated


def test_gram_hashes_distinct_and_md5(spark):
    df = spark.createDataFrame([("a b a b a b",)], ["text"])
    arr = df.select(word_ngram_hashes(F.col("text"), 2).alias("g")).collect()[0].g
    # grams: 'a b','b a','a b','b a','a b' -> 2 distinct
    assert len(arr) == 2 and all(len(h) == 32 for h in arr)


def test_broadcast_no_corpus_shuffle_by_gram(spark):
    corpus = spark.createDataFrame([(1, BENCH_TEXT)], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, BENCH_TEXT)], ["doc_id", "text"])
    plan = ngram_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
