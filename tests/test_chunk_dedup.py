"""Tests for corpus-duplicated chunk signals (CCNet-style)."""

from pivot_spark.operators.chunk_dedup import chunk_dup_signals


def test_chunk_dup_signals_basic(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # chunks: "a b c", "d e f"
            (2, "a b c x y"),          # chunks: "a b c", "x y"
            (3, ""),                   # no words
            (4, "d e f"),              # chunk: "d e f"
        ],
        ["doc_id", "text"],
    )
    out = chunk_dup_signals(docs, "doc_id", "text", chunk_words=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 4
    assert (by_id[1]["n_chunks"], by_id[1]["n_dup_chunks"]) == (2, 2)
    assert by_id[1]["dup_chunk_fraction"] == 1.0
    assert (by_id[2]["n_chunks"], by_id[2]["n_dup_chunks"]) == (2, 1)
    assert by_id[2]["dup_chunk_fraction"] == 0.5
    assert (by_id[3]["n_chunks"], by_id[3]["n_dup_chunks"]) == (0, 0)
    assert by_id[3]["dup_chunk_fraction"] == 0.0
    assert (by_id[4]["n_chunks"], by_id[4]["n_dup_chunks"]) == (1, 1)


def test_chunk_dup_within_single_doc_counts(spark):
    # the same chunk twice inside ONE doc is corpus frequency 2
    docs = spark.createDataFrame([(1, "p q p q"), (2, "z z")], ["doc_id", "text"])
    out = chunk_dup_signals(docs, "doc_id", "text", chunk_words=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert (by_id[1]["n_chunks"], by_id[1]["n_dup_chunks"]) == (2, 2)
    assert (by_id[2]["n_chunks"], by_id[2]["n_dup_chunks"]) == (1, 0)


def test_chunk_tail_shorter_than_window(spark):
    docs = spark.createDataFrame([(1, "a b c d"), (2, "d")], ["doc_id", "text"])
    out = chunk_dup_signals(docs, "doc_id", "text", chunk_words=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc1 tail chunk "d" == doc2's only chunk
    assert (by_id[1]["n_chunks"], by_id[1]["n_dup_chunks"]) == (2, 1)
    assert (by_id[2]["n_chunks"], by_id[2]["n_dup_chunks"]) == (1, 1)
