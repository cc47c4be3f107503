"""max_comparisons fail-fast guards across the candidate-explosive exact
operators (round-6 verdict item 7): the e10 device — a linear-cost probe
that measures the candidate volume BEFORE any pair shuffle and raises an
actionable ValueError naming the volume and a bounded alternative —
propagated to ngram_containment_pairs, tfidf_cosine_pairs and
fuzzy_join. Each operator gets the same two-sided regression test:
a tiny bound raises with the measured volume; a generous bound returns
results identical to the guard-off default (the probe must not perturb
the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "one two three four five six seven"),
        (4, "spark table join agg window group sort merge"),
        (5, "spark table join agg window group sort merge hash"),
    ]
    return spark.createDataFrame(texts, ["doc_id", "text"])


def _pairs(rows, *cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


class TestContainmentGuard:
    def test_tiny_bound_raises_with_volume(self, docs):
        from pivot_spark.operators.neardup import ngram_containment_pairs

        with pytest.raises(ValueError, match="prefix x posting join rows"):
            ngram_containment_pairs(docs, threshold=0.8, max_comparisons=0)

    def test_generous_bound_is_parity(self, docs):
        from pivot_spark.operators.neardup import ngram_containment_pairs

        base = ngram_containment_pairs(docs, threshold=0.8).collect()
        guarded = ngram_containment_pairs(
            docs, threshold=0.8, max_comparisons=10**8
        ).collect()
        assert _pairs(base, "id_a", "id_b", "containment") == _pairs(
            guarded, "id_a", "id_b", "containment"
        )
        assert len(base) > 0  # the fixture produces real pairs


class TestTfidfGuard:
    @pytest.fixture(scope="class")
    def terms(self, spark):
        rows = [
            (1, "spark table join agg window".split()),
            (2, "spark table join agg window".split()),
            (3, "spark table join merge sort".split()),
            (4, "hash value part row batch".split()),
        ]
        return spark.createDataFrame(rows, "doc long, terms array<string>")

    def test_tiny_bound_raises_with_volume(self, terms):
        from pivot_spark.operators.tfidf import tfidf_cosine_pairs

        with pytest.raises(ValueError, match="candidate pairs"):
            tfidf_cosine_pairs(
                terms, "doc", "terms", threshold=0.2, max_comparisons=0
            )

    def test_generous_bound_is_parity(self, terms):
        from pivot_spark.operators.tfidf import tfidf_cosine_pairs

        base = tfidf_cosine_pairs(terms, "doc", "terms", threshold=0.2).collect()
        guarded = tfidf_cosine_pairs(
            terms, "doc", "terms", threshold=0.2, max_comparisons=10**8
        ).collect()
        assert _pairs(base, "id_a", "id_b", "cosine") == _pairs(
            guarded, "id_a", "id_b", "cosine"
        )
        assert len(base) > 0

    def test_probe_counts_post_prune_volume(self, spark):
        # a stop-grade term (df == N) dominates sum C(df,2); with the
        # default max_df_share it is pruned BEFORE the probe, so the
        # guard measures the join that will actually run
        from pivot_spark.operators.tfidf import tfidf_cosine_pairs

        rows = [(i, ["stop", f"u{i}"]) for i in range(1, 21)]
        df = spark.createDataFrame(rows, "doc long, terms array<string>")
        # pruned: volume 0 -> no raise even with bound 1
        out = tfidf_cosine_pairs(
            df, "doc", "terms", threshold=0.01, max_comparisons=1
        ).collect()
        assert out == []
        # unpruned (max_df_share=1.0): C(20,2) = 190 > 1 -> raises
        with pytest.raises(ValueError, match="1.900e\\+02"):
            tfidf_cosine_pairs(
                df, "doc", "terms", threshold=0.01,
                max_df_share=1.0, max_comparisons=1,
            )


class TestFuzzyGuard:
    @pytest.fixture(scope="class")
    def names(self, spark):
        dirty = spark.createDataFrame(
            [(10, "widgit"), (11, "blu"), (12, "bolt")], ["lid", "lname"]
        )
        clean = spark.createDataFrame(
            [(1, "widget"), (2, "blue"), (3, "bolt")], ["rid", "rname"]
        )
        return dirty, clean

    @staticmethod
    def _block(col):
        return F.substring(F.col(col), 1, 1)

    def test_tiny_bound_raises_with_volume(self, names):
        from pivot_spark.operators.fuzzy import fuzzy_join

        dirty, clean = names
        with pytest.raises(ValueError, match="candidate join rows"):
            fuzzy_join(
                dirty, clean, "lname", "rname", 2,
                self._block("lname"), self._block("rname"),
                max_comparisons=0,
            )

    @pytest.mark.parametrize("dedup,band", [(True, True), (False, False)])
    def test_generous_bound_is_parity(self, names, dedup, band):
        from pivot_spark.operators.fuzzy import fuzzy_join

        dirty, clean = names
        kw = dict(dedup_verify=dedup, length_band=band)
        base = fuzzy_join(
            dirty, clean, "lname", "rname", 2,
            self._block("lname"), self._block("rname"), **kw,
        ).collect()
        guarded = fuzzy_join(
            dirty, clean, "lname", "rname", 2,
            self._block("lname"), self._block("rname"),
            max_comparisons=10**8, **kw,
        ).collect()
        assert _pairs(base, "lid", "rid", "dist") == _pairs(
            guarded, "lid", "rid", "dist"
        )
        assert len(base) > 0

    def test_probe_measures_post_defense_volume(self, spark):
        # 10 exact clones of one key on each side: dedup_verify collapses
        # them to 1x1 per block, so the guarded volume is 1 — the probe
        # must count the join that runs, not the naive block join (100)
        from pivot_spark.operators.fuzzy import fuzzy_join

        dirty = spark.createDataFrame(
            [(i, "widget") for i in range(10)], ["lid", "lname"]
        )
        clean = spark.createDataFrame(
            [(100 + i, "widget") for i in range(10)], ["rid", "rname"]
        )
        out = fuzzy_join(
            dirty, clean, "lname", "rname", 1,
            self._block("lname"), self._block("rname"),
            max_comparisons=5,  # < naive 100, >= deduped 1 (x3 bands)
        )
        assert out.count() == 100  # re-expansion restores row pairs
