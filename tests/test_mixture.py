"""Mixture-sampling unit tests (operators/sample.py mixture_*)."""

import pytest

from pivot_spark.operators.sample import mixture_rates, mixture_sample


@pytest.fixture()
def corpus(spark):
    rows = [(i, "web" if i < 80 else ("code" if i < 95 else "books"), 10) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


def test_rates_downsample_to_quota(corpus):
    # web has 800 tokens; 50% of a 400-token budget = 200 -> rate 0.25
    r = mixture_rates(corpus, "source", "n_tok", {"web": 0.5, "code": 0.25, "books": 0.25}, 400.0)
    assert r["web"] == pytest.approx(0.25)
    assert r["code"] == pytest.approx(100 / 150)
    assert r["books"] == pytest.approx(1.0)  # wants 100, has 50 -> capped


def test_missing_stratum_rate_is_one(corpus):
    r = mixture_rates(corpus, "source", "n_tok", {"web": 0.5, "wiki": 0.5}, 100.0)
    assert r["wiki"] == 1.0  # nothing available: keep-all of nothing


def test_sample_is_deterministic_and_drops_untargeted(corpus):
    kw = dict(targets={"web": 0.6, "code": 0.4}, budget=300.0)
    a = sorted(r.doc_id for r in mixture_sample(corpus, "doc_id", "source", "n_tok", **kw).collect())
    b = sorted(r.doc_id for r in mixture_sample(corpus, "doc_id", "source", "n_tok", **kw).collect())
    assert a == b and len(a) > 0
    out = mixture_sample(corpus, "doc_id", "source", "n_tok", **kw)
    assert out.filter(out.source == "books").count() == 0


def test_sampled_mixture_close_to_target(spark):
    # large strata -> realized token shares approach the declared mix
    rows = [(i, "a" if i % 10 < 8 else "b", 1) for i in range(20000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = mixture_sample(df, "doc_id", "source", "n_tok", {"a": 0.5, "b": 0.5}, 5000.0)
    counts = {r.source: r.n for r in out.groupBy("source").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert abs(counts["a"] / total - 0.5) < 0.05
    assert abs(total - 5000) / 5000 < 0.05


def test_validation(corpus):
    with pytest.raises(ValueError):
        mixture_rates(corpus, "source", "n_tok", {"web": 0.5}, 100.0)  # shares != 1
    with pytest.raises(ValueError):
        mixture_rates(corpus, "source", "n_tok", {"web": 1.0}, 0.0)  # bad budget
