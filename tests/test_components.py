"""Tests for connected components (large-star/small-star) and
cluster-aware dedup."""

import pytest

from pyspark.sql import functions as F

from pivot_spark.operators.components import connected_components, dedup_clusters


def _labels(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_distributed_path_matches_driver_path(spark):
    # same graph through both execution strategies (adaptive driver
    # union-find vs large-star/small-star rounds)
    pairs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)]
    fast = _labels(spark, pairs)
    dist = _labels(spark, pairs, driver_max_edges=0)
    assert fast == dist


def test_cc_distributed_chain(spark):
    n = 40
    lab = _labels(spark, [(i, i + 1) for i in range(n)], driver_max_edges=0)
    assert set(lab.values()) == {0}
    assert len(lab) == n + 1


def test_cc_two_triangles(spark):
    lab = _labels(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)])
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_chain_merges_transitively(spark):
    # a long path: naive one-hop propagation needs len(path) rounds;
    # star rounds collapse it in O(log n)
    n = 40
    lab = _labels(spark, [(i, i + 1) for i in range(n)])
    assert set(lab.values()) == {0}
    assert len(lab) == n + 1


def test_cc_duplicate_and_reversed_edges(spark):
    lab = _labels(spark, [(2, 1), (1, 2), (2, 1), (5, 4)])
    assert lab == {1: 1, 2: 1, 4: 4, 5: 4}


def test_cc_self_loops_ignored(spark):
    lab = _labels(spark, [(7, 7), (7, 8)])
    assert lab == {7: 7, 8: 7}


def test_cc_star_graph(spark):
    # hub with many leaves — the skew case large-star is built for
    lab = _labels(spark, [(100, i) for i in range(20)])
    assert set(lab.values()) == {0}
    assert len(lab) == 21


def test_cc_matches_networkx_style_bruteforce(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]

    # brute-force union-find oracle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in pairs:
        for n in (a, b):
            want[n] = find(n)
    # canonicalize oracle labels to component-min
    comp_min = {}
    for n, c in want.items():
        comp_min[c] = min(comp_min.get(c, n), n)
    want = {n: comp_min[c] for n, c in want.items()}

    assert _labels(spark, pairs) == want


def test_dedup_clusters_keep_flag(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], ["id_a", "id_b"]
    )
    out = dedup_clusters(docs, pairs, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 8
    # cluster {1,2,5} keeps 1; {6,7} keeps 6; singletons keep themselves
    assert [by_id[i]["cluster"] for i in range(8)] == [0, 1, 1, 3, 4, 1, 6, 6]
    assert [by_id[i]["keep"] for i in range(8)] == [
        True, True, False, True, True, False, True, False,
    ]
    kept = [r for r in out if r["keep"]]
    assert {r["cluster"] for r in kept} == {0, 1, 3, 4, 6}
    assert len(kept) == len({r["cluster"] for r in out})
