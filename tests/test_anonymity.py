"""Privacy screens (operators/anonymity.py): k-anonymity, l-diversity,
deterministic-Laplace DP aggregates — each checked against a pure-Python
replay of the documented formulas."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.anonymity import (
    dp_count,
    dp_sum,
    k_anonymity_report,
    l_diversity_report,
)


def _py_laplace(cell: str, b: float, salt: str) -> float:
    h = hashlib.md5(f"{salt}:{cell}".encode()).hexdigest()[:12]
    u = (int(h, 16) + 0.5) / 16**12
    v = u - 0.5
    return -b * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))


def test_k_anonymity_report(spark):
    rows = [("us", "a"), ("us", "a"), ("us", "a"), ("us", "b"), (None, "a")]
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {
        (r.nation, r.seg): (r.class_size, r.at_risk)
        for r in k_anonymity_report(df, ["nation", "seg"], k=3).collect()
    }
    assert out[("us", "a")] == (3, False)
    assert out[("us", "b")] == (1, True)
    # NULL QI values form their own class (a bucket a joiner still sees)
    assert out[(None, "a")] == (1, True)
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["nation"], k=0)


def test_l_diversity_report(spark):
    rows = [
        ("g1", "flu"), ("g1", "flu"), ("g1", "flu"),      # homogeneous
        ("g2", "flu"), ("g2", "cold"), ("g2", None),      # NULL ignored
    ]
    df = spark.createDataFrame(rows, "qi string, dx string")
    out = {
        r.qi: (r.class_size, r.n_sensitive, r.diverse)
        for r in l_diversity_report(df, ["qi"], "dx", l=2).collect()
    }
    assert out["g1"] == (3, 1, False)
    assert out["g2"] == (3, 2, True)
    with pytest.raises(ValueError):
        l_diversity_report(df, ["qi"], "dx", l=0)


def test_dp_count_matches_replay_and_is_deterministic(spark):
    rows = [("a",)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(rows, "k string")
    eps = 0.5
    got1 = {r.k: r.noisy_count for r in dp_count(df, ["k"], epsilon=eps, salt="s").collect()}
    got2 = {r.k: r.noisy_count for r in dp_count(df, ["k"], epsilon=eps, salt="s").collect()}
    assert got1 == got2  # repeated release returns the SAME answer
    for key, true_n in (("a", 7), ("b", 3)):
        want = true_n + _py_laplace(key, 1.0 / eps, "s")
        assert got1[key] == pytest.approx(want, rel=1e-12)
    # different salt draws different noise
    got3 = {r.k: r.noisy_count for r in dp_count(df, ["k"], epsilon=eps, salt="t").collect()}
    assert got3 != got1
    with pytest.raises(ValueError):
        dp_count(df, ["k"], epsilon=0.0)


def test_dp_sum_clips_contributions(spark):
    rows = [("a", 50.0), ("a", 500.0), ("a", -20.0), ("a", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    clip = 100.0
    out = dp_sum(df, ["k"], "v", clip=clip, epsilon=1.0, salt="s").collect()
    # 50 + clamp(500)=100 + clamp(-20)=0 + null=0 -> 150 + noise
    want = 150.0 + _py_laplace("a", clip / 1.0, "s")
    assert out[0].noisy_sum == pytest.approx(want, rel=1e-12)
    with pytest.raises(ValueError):
        dp_sum(df, ["k"], "v", clip=0.0)


def test_laplace_noise_distribution_sanity(spark):
    """Across many cells the deterministic draws should look Laplace:
    roughly centred, ~half the mass within b*ln(2)."""
    df = spark.createDataFrame([(str(i),) for i in range(2000)], "k string")
    out = dp_count(df, ["k"], epsilon=1.0, salt="dist").collect()
    noises = [r.noisy_count - 1.0 for r in out]
    mean = sum(noises) / len(noises)
    assert abs(mean) < 0.12  # E|Lap(1)| = 1, se ~ 1.4/sqrt(2000)
    within = sum(1 for n in noises if abs(n) <= math.log(2.0)) / len(noises)
    assert 0.44 < within < 0.56  # median of |Lap(b)| is b*ln 2


def test_pii_report(spark):
    rows = [
        ("s1", "mail me at a.b@x.com or c@y.org, ip 10.0.0.1"),
        ("s1", "nothing here"),
        ("s2", "ssn 123-45-6789 and 123-45-6789 again"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    from pivot_spark.operators.anonymity import pii_report

    out = {r.source: r for r in pii_report(df, "text", "source").collect()}
    assert out["s1"].n_docs == 2
    assert out["s1"].email_docs == 1 and out["s1"].email_hits == 2
    assert out["s1"].ip_docs == 1 and out["s1"].ip_hits == 1
    assert out["s1"].ssn_hits == 0
    assert out["s2"].ssn_docs == 1 and out["s2"].ssn_hits == 2
    with pytest.raises(ValueError):
        pii_report(df, "text", "source", patterns=[])


def test_table_checksum_partition_invariant(spark):
    from pivot_spark.operators.validate import table_checksum

    rows = [(i, f"t{i}", None if i % 3 == 0 else "en") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    a = {r.bucket: (r.n_rows, r.checksum)
         for r in table_checksum(df, ["id", "text", "lang"], 8).collect()}
    # shuffled partitioning + reversed row order -> identical frame
    b = {r.bucket: (r.n_rows, r.checksum)
         for r in table_checksum(
             df.orderBy(F.col("id").desc()).repartition(7),
             ["id", "text", "lang"], 8).collect()}
    assert a == b
    assert sum(n for n, _ in a.values()) == 40
    # any single-cell change moves exactly one bucket's checksum
    df2 = spark.createDataFrame(
        [(i, f"t{i}", None if i % 3 == 0 else "en") if i != 17
         else (17, "CHANGED", "en") for i in range(40)],
        "id long, text string, lang string")
    c = {r.bucket: (r.n_rows, r.checksum)
         for r in table_checksum(df2, ["id", "text", "lang"], 8).collect()}
    assert c != a
    diff = [k for k in set(a) | set(c) if a.get(k) != c.get(k)]
    assert 1 <= len(diff) <= 2  # old bucket loses the row, new gains it
    # NULL is distinct from the string 'null' and from ''
    d1 = spark.createDataFrame([(1, None)], "id long, v string")
    d2 = spark.createDataFrame([(1, "null")], "id long, v string")
    k1 = table_checksum(d1, ["id", "v"], 1).collect()[0].checksum
    k2 = table_checksum(d2, ["id", "v"], 1).collect()[0].checksum
    assert k1 != k2
    with pytest.raises(ValueError):
        table_checksum(df, [], 8)
