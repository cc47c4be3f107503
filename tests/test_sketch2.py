"""hll_overlap_matrix accuracy + neardup_minhash_incremental equivalence."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.sketch import hll_overlap_matrix


def test_hll_overlap_close_to_exact(spark):
    # groups with engineered overlap: A = 0..999, B = 500..1499, C = 0..99
    rows = (
        [("A", i) for i in range(1000)]
        + [("B", i) for i in range(500, 1500)]
        + [("C", i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "g string, m long")
    out = {(r.group_a, r.group_b): r for r in hll_overlap_matrix(df, "g", "m").collect()}
    exact = {("A", "B"): (1000, 1000, 1500, 500), ("A", "C"): (1000, 100, 1000, 100),
             ("B", "C"): (1000, 100, 1100, 0)}
    for k, (na, nb, nu, ov) in exact.items():
        r = out[k]
        # lg_k=14 -> rel err ~0.8%; allow 3 sigma ~ 2.5% (+abs slack for 0)
        assert r.n_a == pytest.approx(na, rel=0.025)
        assert r.n_b == pytest.approx(nb, rel=0.025)
        assert r.n_union == pytest.approx(nu, rel=0.025)
        assert r.n_overlap == pytest.approx(ov, rel=0.1, abs=60)
        assert r.n_overlap >= 0
    assert len(out) == 3


def test_incremental_minhash_matches_full_rebuild(spark):
    from pivot_spark.operators.neardup import (
        minhash_signatures,
        neardup_minhash_incremental,
        neardup_minhash_lsh,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    delta = d.filter(F.col("doc_id") % 5 == 0)
    index = minhash_signatures(corpus, "doc_id", "text")
    pairs, new_index = neardup_minhash_incremental(index, delta, "doc_id", "text")
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}

    full = neardup_minhash_lsh(d, threshold=0.5).collect()
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    assert got == want
    # updated index covers the whole corpus, ready for the next delta
    assert new_index.count() == d.count()
