"""Input-width guard for Arrow kernels (round 7 §2.5 fix): a
single-partition scan must not funnel a whole mapInPandas kernel
through one Python worker, and spreading must never change results."""

def test_spread_widens_narrow_input(spark):
    from pivot_spark.operators._spread import spread_input

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    assert spread_input(narrow).rdd.getNumPartitions() == par


def test_spread_is_identity_on_wide_input(spark):
    from pivot_spark.operators._spread import spread_input

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, par + 4)
    out = spread_input(wide)
    assert out is wide  # no extra exchange when already wide enough


def test_minhash_signatures_identical_under_spread(spark):
    """Signatures are per-doc deterministic: the round-robin spread may
    reorder rows but never change any (id, minhash, shingles) triple."""
    import pivot_spark.operators.neardup as nd

    rows = [(i, f"w{i % 7} w{i % 5} w{i % 3} w{i} end") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)

    def canon(frame):
        return sorted(
            (r["__id"], tuple(r["__minhash"]), tuple(sorted(r["__shingles"])))
            for r in frame.collect()
        )

    spread = canon(nd.minhash_signatures(df, "doc_id", "text", 32, 3, 42))
    orig = nd.spread_input
    nd.spread_input = lambda d: d
    try:
        flat = canon(nd.minhash_signatures(df, "doc_id", "text", 32, 3, 42))
    finally:
        nd.spread_input = orig
    assert spread == flat
