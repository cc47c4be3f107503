"""File stats + small-file compaction (operators/layout.py)."""

import os

import pytest

from pivot_spark.operators.layout import compact, file_stats


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("frag") / "t")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k", "uuid() AS pad")
    # 40 tiny files
    df.repartition(40).write.parquet(d)
    return d


def test_file_stats(spark, fragmented):
    df = spark.read.parquet(fragmented)
    stats = file_stats(df).collect()
    assert len(stats) == 40
    assert sum(r["n_rows"] for r in stats) == 10_000


def test_compact_reduces_files_preserves_rows(spark, fragmented, tmp_path):
    out = str(tmp_path / "compacted")
    n = compact(spark, fragmented, out, target_bytes=8 * 1024 * 1024)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n < 40
    a = spark.read.parquet(fragmented)
    b = spark.read.parquet(out)
    assert b.count() == 10_000
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_compact_bad_target(spark, fragmented, tmp_path):
    with pytest.raises(ValueError, match="target_bytes"):
        compact(spark, fragmented, str(tmp_path / "x"), target_bytes=0)
