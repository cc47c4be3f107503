"""registered_domain / domain_stats / drop_blocklisted + readability."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.functions.text import (
    fk_grade,
    flesch_reading_ease,
    sentence_count,
    syllable_count,
)
from pivot_spark.operators.web import (
    domain_stats,
    drop_blocklisted,
    host_of,
    registered_domain,
)


def _dom(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(registered_domain(host_of(F.col("url"))).alias("d")).first().d


def test_registered_domain_heuristic(spark):
    assert _dom(spark, "https://www.example.com/a/b") == "example.com"
    assert _dom(spark, "http://example.com") == "example.com"
    assert _dom(spark, "https://cdn.assets.news.co.uk/x") == "news.co.uk"
    assert _dom(spark, "https://a.b.c.gov.au/") == "c.gov.au"
    assert _dom(spark, "https://deep.sub.site.io/p?q=1") == "site.io"
    assert _dom(spark, "https://localhost/") == "localhost"
    # 2-letter TLD without a public second-level keeps two labels
    assert _dom(spark, "https://www.site.de/") == "site.de"


def test_domain_stats_and_blocklist(spark):
    rows = [
        (1, "https://a.example.com/1", "en", 100),
        (2, "https://b.example.com/2", "fr", 200),
        (3, "https://other.org/3", "en", 300),
        (4, "https://other.org/4", "en", 500),
    ]
    df = spark.createDataFrame(rows, "id long, url string, lang string, n long")
    out = {r.domain: r for r in domain_stats(df, "url", "lang", "n").collect()}
    assert out["example.com"].n_docs == 2
    assert out["example.com"].n_langs == 2
    assert out["example.com"].share == pytest.approx(0.5)
    assert out["other.org"].avg_size == pytest.approx(400.0)

    blocked = spark.createDataFrame([("other.org",)], "domain string")
    kept = drop_blocklisted(df, "url", blocked)
    assert sorted(r.id for r in kept.collect()) == [1, 2]
    assert kept.columns == df.columns


def test_readability_hand_computed(spark):
    # "hello world. it is good." -> 5 words, 2 sentences,
    # syllables: hel-lo(2) world(1) it(1) is(1) good(1) = 6
    df = spark.createDataFrame([("hello world. it is good.",)], "t string")
    r = df.select(
        sentence_count(F.col("t")).alias("s"),
        syllable_count(F.col("t")).alias("syl"),
        flesch_reading_ease(F.col("t")).alias("f"),
        fk_grade(F.col("t")).alias("g"),
    ).first()
    assert r.s == 2 and r.syl == 6
    w, s, syl = 5.0, 2.0, 6.0
    assert r.f == pytest.approx(206.835 - 1.015 * (w / s) - 84.6 * (syl / w))
    assert r.g == pytest.approx(0.39 * (w / s) + 11.8 * (syl / w) - 15.59)
    # no punctuation -> one run-on sentence; vowelless word -> 1 syllable
    r2 = spark.createDataFrame([("hmm tsk",)], "t string").select(
        sentence_count(F.col("t")).alias("s"), syllable_count(F.col("t")).alias("syl")
    ).first()
    assert r2.s == 1 and r2.syl == 2
    # empty text -> NULL scores
    r3 = spark.createDataFrame([("",)], "t string").select(
        flesch_reading_ease(F.col("t")).alias("f")
    ).first()
    assert r3.f is None
