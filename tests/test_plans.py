"""Physical-plan regression tests: pin the plan shapes the 100 TB design
depends on (single exchange, column pruning, broadcast sides) so a
refactor can't silently regress them."""

import pytest

from pyspark.sql import functions as F

from pivot_spark import OnError, PivotConfig, pivot


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_single_exchange_and_pruned_scan(spark, tmp_path, sales_df):
    path = str(tmp_path / "sales_pq")
    sales_df.write.parquet(path)
    df = spark.read.parquet(path)
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    out = pivot(df, cfg).output
    plan = plan_of(out)
    # one shuffle: partial agg -> exchange on group key -> final agg
    assert plan.count("Exchange hashpartitioning") == 1
    # column pruning: Brand/ShopID never reach the scan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "Quarter" in read and "Product" in read and "Sales" in read
    assert "Brand" not in read and "ShopID" not in read


def test_error_port_anti_join_broadcasts(spark, sales_df):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        on_error=OnError.ERROR_PORT,
    )
    res = pivot(sales_df, cfg)
    plan = plan_of(res.output)
    # bad-group-key side is tiny: must be a broadcast join, never SMJ
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


@pytest.fixture()
def vec_df(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_single_scan_no_join(spark, vec_df):
    """cosine_topk ships the query matrix in the mapInPandas closure:
    the corpus is scanned once with NO join and the only shuffle is the
    tiny (n_queries x k)-row final merge keyed by query id."""
    from pivot_spark.operators.similarity import cosine_topk

    q = vec_df.filter(F.col("vec_id") <= 1)
    out = cosine_topk(vec_df, q, k=2)
    plan = plan_of(out)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") - plan.count("Exchange SinglePartition") <= 1
    assert "MapInPandas" in plan


def test_num_partitions_respected(spark, sales_df):
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
        num_partitions=7,
    )
    out = pivot(sales_df, cfg).output
    assert "hashpartitioning(Product" in plan_of(out)
    assert out.count() == 3


def test_filter_pushdown_reaches_scan(spark, tmp_path, sales_df):
    path = str(tmp_path / "sales_pq2")
    sales_df.write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("Quarter") == "Q1")
    cfg = PivotConfig(
        pivot_columns="Quarter=Q1",
        pivot_rows="Product",
        aggregates="s:sum(Sales)",
    )
    plan = plan_of(pivot(df, cfg).output)
    assert "PushedFilters: [" in plan and "Quarter" in plan.split("PushedFilters")[1][:80]


def test_bucketed_join_avoids_shuffle(spark, tmp_path, sales_df):
    from pivot_spark.sources.io import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(sales_df, "sales_a", "Product", num_buckets=4)
        write_bucketed_table(
            sales_df.select("Product", "Sales"), "sales_b", "Product", num_buckets=4
        )
        a, b = spark.table("sales_a"), spark.table("sales_b")
        joined = a.join(b, "Product")
        plan = plan_of(joined)
        # co-located layout: the join runs with ZERO exchanges
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS sales_a")
        spark.sql("DROP TABLE IF EXISTS sales_b")


# --- plan pins for the round-2 operator batch ------------------------------


def test_upsert_never_shuffles_base(spark):
    """upsert: base side must reach the anti-join without an exchange —
    the delta key set is broadcast."""
    from pivot_spark.operators.merge import upsert

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    delta = spark.range(10).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    plan = plan_of(upsert(base, delta, ["k"]))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_sample_global_is_take_ordered(spark):
    """Global weighted top-k compiles to TakeOrdered (per-partition
    heaps), not a global sort."""
    from pivot_spark.operators.sample import weighted_sample_k

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = plan_of(weighted_sample_k(df, "id", "w", 5))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_tumbling_agg_single_exchange(spark):
    from pivot_spark.operators.windows import tumbling_agg

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], ["k", "s"]
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    plan = plan_of(
        tumbling_agg(df, "ts", "1 hour", ["k"], [F.count(F.lit(1)).alias("n")])
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_cluster_by_zorder_range_partitions(spark):
    from pivot_spark.operators.layout import cluster_by_zorder

    df = spark.range(100).select(
        F.col("id").alias("x"), (F.col("id") * 3 % 97).alias("y")
    )
    plan = plan_of(cluster_by_zorder(df, ["x", "y"], bits=5, num_partitions=4))
    assert "rangepartitioning(zorder_key" in plan


def test_unigram_lm_vocab_is_broadcast(spark):
    """The vocab join must broadcast (hot tokens replicated, no shuffle
    skew) and the top-V selection must be TakeOrdered."""
    from pivot_spark.operators.lm import unigram_lm_score

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = plan_of(unigram_lm_score(df, vocab_size=10))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_kmeans_assign_is_scan_stage(spark):
    """Cluster assignment embeds centroids as literals: no join, no
    exchange anywhere in the plan."""
    from pivot_spark.operators.kmeans import assign_clusters

    df = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vid long, vec array<double>"
    )
    plan = plan_of(assign_clusters(df, "vec", [[0.0, 0.0], [1.0, 1.0]]))
    assert "Exchange" not in plan and "Join" not in plan


def test_cms_estimate_broadcasts_sketch(spark):
    """The sketch side of a CMS point query is <= depth*width rows and
    must broadcast: the probe frame is never shuffled for the join."""
    from pivot_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(50)], ["k"])
    sk = cms_build(df, "k", width=64, depth=3)
    out = cms_estimate(sk, df.distinct(), "k", width=64, depth=3)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_ratio_table_broadcasts(spark):
    """DSIR's bucket->log-ratio table is <= num_buckets rows: the
    scoring join must broadcast it onto the doc-bucket counts."""
    from pivot_spark.operators.dsir import dsir_logweights

    df = spark.createDataFrame(
        [(i, "a b c d", i % 2 == 0) for i in range(30)], ["id", "text", "t"]
    )
    out = dsir_logweights(df, "id", "text", F.col("t"), num_buckets=64)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_spearman_no_global_sort(spark):
    """Spearman's rank maps must never globally sort a row-sized frame:
    no Sort with a SinglePartition exchange feeding it beyond the tiny
    per-range-totals window (bounded by num_ranges rows)."""
    from pivot_spark.operators.profile import spearman_matrix

    df = spark.createDataFrame(
        [(float(i % 7), float(i % 5)) for i in range(100)], ["x", "y"]
    )
    out = spearman_matrix(df, ["x", "y"], num_ranges=4)
    plan = plan_of(out)
    # the fact-frame ranking runs per range partition: a range exchange
    # must exist, and the only single-partition exchanges feed the tiny
    # totals/offsets window or the final 1-row aggregate
    assert "rangepartitioning" in plan.lower()


def test_denormalize_all_broadcast_no_fact_shuffle(spark):
    """The dim chain must compile to BroadcastHashJoins only: no
    SortMergeJoin, no Exchange hashpartitioning of the fact frame."""
    from pivot_spark.operators.denorm import Dim, denormalize

    fact = spark.createDataFrame(
        [(i, i % 3, i % 5, float(i)) for i in range(100)],
        ["id", "k1", "k2", "v"],
    )
    d1 = spark.createDataFrame([(i, f"a{i}") for i in range(3)], ["dk1", "name1"])
    d2 = spark.createDataFrame([(i, f"b{i}") for i in range(5)], ["dk2", "name2"])
    wide = denormalize(fact, [Dim(d1, "k1", "dk1"), Dim(d2, "k2", "dk2")])
    plan = plan_of(wide)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_classifier_scoring_is_scan_stage(spark, tmp_path):
    """hashed_linear_score must stay a zero-shuffle projection over a
    pruned scan — model inference at read bandwidth."""
    from pivot_spark.operators.classifier import hashed_linear_score

    path = str(tmp_path / "docs_pq")
    spark.createDataFrame(
        [(1, "hello world", "en")], "doc_id long, text string, lang string"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = hashed_linear_score(df.select("doc_id", "text"), "text")
    plan = plan_of(out)
    assert "Exchange" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read  # pruned


def test_seasonal_anomalies_broadcasts_profile(spark):
    """The per-(key, phase) profile joins back as a broadcast — the fact
    side must never sort-merge."""
    import datetime

    from pivot_spark.operators.analytics import seasonal_anomalies

    df = spark.createDataFrame(
        [(1, "click", datetime.datetime(2024, 1, 1), 1.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    plan = plan_of(seasonal_anomalies(df, "event_type", "ts", "value"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cuped_broadcasts_stats(spark):
    from pivot_spark.operators.analytics import cuped_adjust

    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, y double, x double")
    plan = plan_of(cuped_adjust(df, "y", "x"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_session_window_single_exchange(spark):
    import datetime

    from pivot_spark.operators.sessionize import session_stats_native

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    plan = plan_of(session_stats_native(df, "user_id", "ts", "30 minutes"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_runs_is_scan_stage(spark, tmp_path):
    """Loop detection must stay a zero-shuffle projection (array folds
    over a pruned scan)."""
    from pivot_spark.operators.spans import repetition_runs

    path = str(tmp_path / "docs_rr")
    spark.createDataFrame(
        [(1, "a a b", "en")], "doc_id long, text string, lang string"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = plan_of(repetition_runs(df.select("doc_id", "text")))
    assert "Exchange" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read


def test_readability_is_scan_stage(spark):
    from pivot_spark.functions.text import flesch_reading_ease

    df = spark.createDataFrame([(1, "hello world.")], "id long, t string")
    from pyspark.sql import functions as F

    plan = plan_of(df.select("id", flesch_reading_ease(F.col("t"))))
    assert "Exchange" not in plan


def test_rfm_broadcasts_boundaries(spark):
    """The quantile-boundary frame must come back as a broadcast — the
    per-key frame is never globally sorted (no ntile window, no
    single-partition Exchange)."""
    import datetime

    from pivot_spark.operators.analytics import rfm_segments

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5), 10.0)],
        "cust long, ts timestamp, amt double",
    )
    plan = plan_of(rfm_segments(df, "cust", "ts", "amt"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan.replace(
        "Exchange SinglePartition", "", 1
    )  # exactly one single-partition exchange: the tiny boundary agg itself


def test_domain_stats_reuses_per_domain_frame(spark):
    """The per-domain aggregate is persisted: the corpus scan + domain
    agg must run once, with both the output and the broadcast total
    reading the cached frame (no second scan), and the total coming
    back as a broadcast (no sort-merge)."""
    from pivot_spark.operators.web import domain_stats

    df = spark.createDataFrame(
        [(1, "https://a.example.com/x", "en", 10)],
        "id long, url string, lang string, n long",
    )
    plan = plan_of(domain_stats(df, "url", "lang", "n"))
    assert plan.count("InMemoryTableScan") >= 2  # output + total reuse
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_png_decode_is_scan_stage(spark, tmp_path):
    """decode_png (header parse + CRC/Adler verification + channel
    means) must be a zero-shuffle projection over the blob scan —
    compressed-container metadata at read bandwidth."""
    from pivot_spark.operators.codecs import decode_png, make_png

    path = str(tmp_path / "png_pq")
    spark.createDataFrame(
        [(1, bytes(4 * 3 * 3)), (2, bytes(range(36)))], "id long, p binary"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    img = df.select("id", make_png(4, 3, F.col("p")).alias("image"))
    plan = plan_of(decode_png(img))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_minhash_audit_pair_stage_is_topk_plus_broadcast(spark):
    """minhash_estimate_report's sample must reach the pair join as a
    TakeOrdered top-k + broadcast semi-join: the corpus is never
    hash-exchanged for the audit, so the pair stage stays O(k^2) at any
    corpus size (round-3 verdict scale item, closed in round 4)."""
    from pivot_spark.operators.neardup import minhash_estimate_report

    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_estimate_report(df, num_hashes=16, sample_size=8)
    plan = plan_of(out)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
