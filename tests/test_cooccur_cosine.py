"""tfidf_cosine_pairs (AllPairs prefix filter exactness) + pmi_pairs."""

import math

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.cooccur import pmi_pairs
from pivot_spark.operators.tfidf import tfidf_cosine_pairs


def _brute_cosine(docs: dict[int, list[str]], threshold: float):
    n = len(docs)
    dfreq: dict[str, int] = {}
    for terms in docs.values():
        for t in set(terms):
            dfreq[t] = dfreq.get(t, 0) + 1
    vecs = {}
    for d, terms in docs.items():
        tf: dict[str, int] = {}
        for t in terms:
            tf[t] = tf.get(t, 0) + 1
        w = {t: c * math.log(n / dfreq[t]) for t, c in tf.items()}
        nrm = math.sqrt(sum(v * v for v in w.values()))
        if nrm > 0:
            vecs[d] = {t: v / nrm for t, v in w.items()}
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            cos = sum(vecs[a][t] * vecs[b].get(t, 0.0) for t in vecs[a])
            if cos >= threshold:
                out[(a, b)] = cos
    return out


def test_cosine_pairs_exact_vs_bruteforce(spark):
    docs = {
        1: "spark table join agg window".split(),
        2: "spark table join agg window".split(),          # dup of 1
        3: "spark table join merge sort".split(),          # partial overlap
        4: "hash value part row batch".split(),            # disjoint-ish
        5: "hash value part row batch spark".split(),
        6: "alpha beta gamma delta".split(),
        7: "alpha beta gamma epsilon zeta".split(),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc long, terms array<string>"
    )
    for t in (0.2, 0.5, 0.9):
        want = _brute_cosine(docs, t)
        got = {
            (r.id_a, r.id_b): r.cosine
            for r in tfidf_cosine_pairs(df, "doc", "terms", threshold=t).collect()
        }
        assert set(got) == set(want), f"threshold {t}"
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_cosine_pairs_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "doc long, terms array<string>")
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, "doc", "terms", threshold=0.0)


def test_pmi_hand_computed(spark):
    # 4 docs; (a,b) always together, (a,c) never, (a,d) independent-ish
    rows = [
        (1, ["a", "b", "d"]),
        (2, ["a", "b"]),
        (3, ["c", "d"]),
        (4, ["a", "b", "d"]),
    ]
    df = spark.createDataFrame(rows, "doc long, terms array<string>")
    out = {
        (r.term_a, r.term_b): r
        for r in pmi_pairs(df, "doc", "terms", min_pair_count=1).collect()
    }
    n = 4.0
    r = out[("a", "b")]
    assert (r.n_ab, r.n_a, r.n_b) == (3, 3, 3)
    assert r.pmi == pytest.approx(math.log(3 * n / 9))
    assert r.npmi == pytest.approx(math.log(3 * n / 9) / -math.log(3 / n))
    assert ("a", "c") not in out          # never co-occur
    r = out[("a", "d")]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 3)
    # duplicate terms in one doc count once
    df2 = spark.createDataFrame([(1, ["x", "x", "y"])], "doc long, terms array<string>")
    r2 = pmi_pairs(df2, "doc", "terms", min_pair_count=1).collect()
    assert len(r2) == 1 and r2[0].n_ab == 1
    # npmi == 1.0 exactly when the pair is in every doc
    assert r2[0].npmi == 1.0
    with pytest.raises(ValueError):
        pmi_pairs(df, "doc", "terms", min_pair_count=0)
