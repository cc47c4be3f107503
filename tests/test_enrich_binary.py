"""Stream-static enrichment join + binaryFile ingestion."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def event_dir(spark, tmp_path):
    d = str(tmp_path / "events")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "user_id int, value double"
    ).write.parquet(d)
    return d


def test_enrich_stream_broadcast_lookup(spark, tmp_path, event_dir):
    from pivot_spark.streaming.enrich_stream import enrich_stream

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id int, tier string"
    )
    stream = spark.readStream.schema("user_id int, value double").parquet(event_dir)
    out = enrich_stream(stream, dim, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.user_id: r.tier for r in spark.sql("SELECT * FROM enriched").collect()}
    # left join: user 3 kept with NULL tier
    assert rows == {1: "gold", 2: "silver", 3: None}


def test_enrich_stream_validation(spark, event_dir):
    from pivot_spark.streaming.enrich_stream import enrich_stream

    dim = spark.createDataFrame([(1, "x")], "user_id int, tier string")
    static = spark.read.parquet(event_dir)
    stream = spark.readStream.schema("user_id int, value double").parquet(event_dir)
    with pytest.raises(ValueError):
        enrich_stream(static, dim, "user_id")  # left must stream
    with pytest.raises(ValueError):
        enrich_stream(stream, stream, "user_id")  # dim must be static
    clash = spark.createDataFrame([(1, 5.0)], "user_id int, value double")
    with pytest.raises(ValueError):
        enrich_stream(stream, clash, "user_id")  # non-key collision
    with pytest.raises(ValueError):
        enrich_stream(stream, dim, "user_id", how="full")


def test_read_binary_files(spark, tmp_path):
    from pivot_spark.sources.io import read_binary_files

    blobs = tmp_path / "blobs"
    blobs.mkdir()
    (blobs / "a.png").write_bytes(b"\x89PNG_fake_a")
    (blobs / "b.png").write_bytes(b"\x89PNG_fake_b" * 100)
    (blobs / "c.txt").write_bytes(b"not an image")

    df = read_binary_files(spark, str(blobs), glob="*.png")
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert set(got) == {"a.png", "b.png"}
    assert got["a.png"] == b"\x89PNG_fake_a"

    small = read_binary_files(spark, str(blobs), glob="*.png", max_bytes=100)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.png"]
    # schema contract for downstream multimodal decode
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }


def test_streaming_upsert_sink(spark, tmp_path):
    from pivot_spark.streaming.upsert_sink import read_upsert_state, start_upsert_sink

    src = tmp_path / "changes"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: initial inserts
    # one part-file per logical batch: micro-batch order is the CDC
    # order contract; multiple part-files would split arbitrarily
    spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False)],
        "id int, val string, ver int, is_deleted boolean",
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "id int, val string, ver int, is_deleted boolean"
    ).parquet(str(src) + "/*")
    q = start_upsert_sink(
        stream, state, ["id"], ckpt, order_col="ver", deleted_col="is_deleted"
    )
    q.awaitTermination(120)
    got = {r.id: r.val for r in read_upsert_state(spark, state).collect()}
    assert got == {1: "a", 2: "b"}

    # batch 2: update key 1 (two versions, max wins), delete key 2, insert 3
    spark.createDataFrame(
        [(1, "a2", 2, False), (1, "a3", 3, False), (2, "b", 2, True), (3, "c", 1, False)],
        "id int, val string, ver int, is_deleted boolean",
    ).coalesce(1).write.parquet(str(src / "b2"))
    q = start_upsert_sink(
        stream, state, ["id"], ckpt, order_col="ver", deleted_col="is_deleted"
    )
    q.awaitTermination(120)
    got = {r.id: (r.val, r.ver) for r in read_upsert_state(spark, state).collect()}
    assert got == {1: ("a3", 3), 3: ("c", 1)}


def test_upsert_sink_requires_stream(spark, tmp_path):
    from pivot_spark.streaming.upsert_sink import start_upsert_sink

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        start_upsert_sink(df, str(tmp_path / "s"), ["id"], str(tmp_path / "c"))
