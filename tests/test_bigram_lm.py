"""Interpolated bigram LM: formula parity with a python replay,
<unk> collapse, short-doc handling."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.lm import bigram_lm_score

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat and dog and cat"),
    (3, "zzz"),          # 1 token -> no bigrams
    (4, ""),             # empty
    (5, "the cat sat"),
]


def _python_replay(vocab_size, lam):
    toks = {i: t.lower().split() for i, t in DOCS}
    uc = Counter(w for ws in toks.values() for w in ws)
    vocab = set(
        w for w, _ in sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    m = {i: [w if w in vocab else "<unk>" for w in ws] for i, ws in toks.items()}
    u = Counter(w for ws in m.values() for w in ws)
    n = sum(u.values())
    bc = Counter((ws[j], ws[j + 1]) for ws in m.values() for j in range(len(ws) - 1))
    out = {}
    for i, ws in m.items():
        prs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not prs:
            out[i] = (0, None)
            continue
        nlp = [
            -math.log(lam * bc[p] / u[p[0]] + (1 - lam) * u[p[1]] / n) for p in prs
        ]
        out[i] = (len(prs), round(sum(nlp) / len(nlp), 4))
    return out


@pytest.mark.parametrize("vocab_size,lam", [(100, 0.7), (3, 0.5)])
def test_matches_python_replay(spark, vocab_size, lam):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_logp"])
        for r in bigram_lm_score(df, vocab_size=vocab_size, lam=lam).collect()
    }
    want = _python_replay(vocab_size, lam)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        if want[i][1] is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(want[i][1], abs=1e-4)


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bigram_lm_score(df, vocab_size=0)
    with pytest.raises(ValueError):
        bigram_lm_score(df, lam=1.5)
