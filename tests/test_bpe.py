"""BPE subword learning/encoding vs the published algorithm (Sennrich
et al. 2016) implemented directly in Python."""

import collections

import pytest

from pivot_spark.operators.bpe import bpe_encode, bpe_learn

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _ref_learn(texts, n):
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        new = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w) + ["</w>"]
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "id long, text string"
    )


def test_bpe_learn_matches_published_algorithm(spark, corpus_df):
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_learn(corpus_df, "text", num_merges=8).collect()
    ]
    assert got == _ref_learn(CORPUS, 8)


def test_bpe_learn_validation(spark, corpus_df):
    with pytest.raises(ValueError):
        bpe_learn(corpus_df, "text", num_merges=0)


def test_bpe_encode_matches_reference(spark, corpus_df):
    merges = [
        (r.left, r.right) for r in bpe_learn(corpus_df, "text", num_merges=8).collect()
    ]
    # stage_every=2 exercises the chain staging
    enc = {
        r.id: r.tokens
        for r in bpe_encode(corpus_df, "text", merges, stage_every=2).collect()
    }
    for i, text in enumerate(CORPUS):
        assert enc[i] == _ref_encode(text, merges), text


def test_bpe_encode_greedy_overlap(spark):
    # 'aaa' with merge (a,a): greedy left-to-right -> [aa, a, </w>]
    df = spark.createDataFrame([(1, "aaa")], "id long, text string")
    out = bpe_encode(df, "text", [("a", "a")]).collect()[0].tokens
    assert out == ["aa", "a", "</w>"]
    assert out == _ref_encode("aaa", [("a", "a")])


def test_bpe_roundtrip_reconstructs_text(spark, corpus_df):
    merges = [
        (r.left, r.right) for r in bpe_learn(corpus_df, "text", num_merges=5).collect()
    ]
    rows = bpe_encode(corpus_df, "text", merges).collect()
    for r in rows:
        rebuilt = "".join(r.tokens).replace("</w>", " ").strip()
        assert rebuilt == CORPUS[r.id].lower()
