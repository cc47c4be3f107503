"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship two-pivot-column query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2.4 P01-P23
plus extension operators), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL per query; keys without an oracle
get the driver's rows-only check.

ORDER MATTERS: the driver's correctness gate checks the FIRST 50 entries
of ``queries()``. Rounds 1-2 verified the original first 50 (p01-p25,
e01-e23); each round since front-loads a window of canaries +
not-yet-driver-checked queries so the hard signal sweeps the whole
declared set over successive rounds (round-2 verdict item #1). Round 7
completed the never-checked backlog; round 8 front-loads every query
whose plan or declared semantics changed in round 7 (the round-7
verdict's item #1 list: e57b's lockstep oracle change first, the
contract rewrites and fold anchors, the ~30 plan-changed queries) plus
the queries round 8 itself touches. The full dict still contains every
query (bench runs them all).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

# Round 8 runs no standing canary either: all 50 slots go to the
# round-7/8-MODIFIED set (round-7 verdict item #1 — the round-7 window
# was pre-committed to the never-checked backlog, so none of the ~30
# queries whose plans or declared semantics changed in round 7 were
# driver-re-checked; this window closes that).
_CANARIES: "list[str]" = []

# Round-8 rotation (50 slots), per the round-7 verdict's explicit list:
# (a) e57b first — its k=⌈√n⌉ change was a LOCKSTEP query+oracle edit
#     the driver has never re-verified;
# (b) the round-7 contract rewrites (e26b/e79/e108b) and rows-only fold
#     anchors (e15_knn_ivf_fullprobe/e71b_knn_pq_rerank) + the e147
#     holdover;
# (c) every round-7 plan-changed query (fuzzy/tfidf/LSH/neardup/
#     bootstrap/OOD/gibberish/markov/krippendorff/classifier/rake/
#     isotonic/ks/hll/scd2/char-LM/guards + the 8-query audio family);
# (d) the queries THIS round touches: the 10 graph-family consumers of
#     the mining stage, e188/e117 media neardup, e81's rank assembly,
#     and the two streaming rows whose state layout is retuned.
_ROUND_WINDOW = [
    "e57b_semdedup_gemm", "e26b_threshold_buckets",
    "e79_incremental_distinct", "e108b_pca_project",
    "e15_knn_ivf_fullprobe", "e71b_knn_pq_rerank",
    "e147_linear_regression", "e73_fuzzy_match",
    "e123_tfidf_cosine_join", "e12_neardup_cosine_lsh", "e09_knn_lsh",
    "e129_neardup_incremental", "e89_containment", "e11_neardup_cosine",
    "e134_poisson_bootstrap", "e221_ood_scores", "e222_char_gibberish",
    "e223_markov_attribution", "e210_krippendorff_alpha",
    "e109_quality_classifier", "e145_rake_weights",
    "e208_isotonic_calibration", "e100_ks_test", "e130_hll_overlap",
    "e70_scd2_apply", "e85_bigram_lm", "e10_ngram_jaccard",
    "e174_audio_features", "e178_audio_downsample", "e182_audio_mixdown",
    "e185_audio_fingerprint", "e186_audio_neardup", "e189_audio_trim",
    "e194_audio_spectral", "e219_audio_gain",
    "e31_dup_clusters", "e82_dedup_keep_best", "e103_triangle_stats",
    "e107_pagerank", "e115_leakage_safe_split", "e116_negative_sampling",
    "e136_label_propagation", "e157_cross_source_dups",
    "e162_degree_stats", "e209_local_clustering",
    "e188_image_neardup_dhash", "e117_image_neardup",
    "e81_spearman_matrix", "s04_stream_debounce",
    "s13_stream_session_native",
]

# Round-7 window (all driver-checked in CORRECTNESS_r07; audit trail).
_R7_WINDOW = [
    "e55_c4_lines",
    "e84_hybrid_rrf", "e86_prototype_prune", "e87_frame_sample",
    "e88_decayed_features", "e90_skew_report", "e91_wilson_rank",
    "e93_mutual_info", "e94_mode_by_key", "e97_winsorized",
    "e98_chi_square", "e99_psi_drift", "e100_ks_test",
    "e102_association_rules", "e104_benford", "e105_column_entropy",
    "e106_resample_locf", "e111_ewma", "e112_seasonal_anomaly",
    "e116_negative_sampling", "e118_redact_cards", "e119_welch_t",
    "e120_cuped", "e121_rfm", "e122_cusum", "e126_domain_stats",
    "e128_repetition_runs", "e130_hll_overlap", "e131_calibration",
    "e132_temperature_mixture", "e142_rocchio", "e145_rake_weights",
    "e149_pareto_frontier", "e150_conformal", "e151_lift_curve",
    "e153_average_precision", "e158_key_containment",
    "e160_sequence_surprise", "e162_degree_stats", "e163_rolling_active",
    "e164_dispersion", "e165_interarrival", "e166_hapax_novelty",
    "e172_encoding_screen", "e173_url_normalize", "e177_image_resize",
    "e183_keyword_contexts", "e184_text_normalize", "e190_image_crop",
    "e196_l_diversity",
]

# Round-6 window (all driver-checked in CORRECTNESS_r06; audit trail).
_R6_WINDOW = [
    "p17",
    "e73_fuzzy_match", "e89_containment", "e228_png_decode",
    "e57b_semdedup_gemm", "e231_png_deflate_decode",
    "e43_cube", "e45_corr_matrix", "e51_quantiles", "e108_covariance",
    "e108b_pca_project", "e110_session_window", "e143_scd2_lookup",
    "e74_attribution", "e156_weighted_quantile", "e200_table_checksum",
    "e198_dp_sum",
    "e25_hash_split", "e26_ntile_buckets", "e26b_threshold_buckets",
    "e27_redact_pii", "e28_repetition", "e29_centroids", "e30_rolling",
    "e30b_rolling_time", "e33_json_extract", "e34_pack_sequences",
    "e35_gopher_quality", "e37_mixture_sample", "e39_funnel",
    "e40_repeat_upsample", "e44_histogram", "e46_skew_distinct",
    "e48_zscore", "e49_bm25_batch", "e52_group_sample_k", "e55_c4_lines",
    "e58_upsert", "e59_quantize_int8", "e60_tumbling_window",
    "e60b_sliding_window", "e62_grouped_ols", "e63_retention",
    "e65_zorder", "e66_table_diff", "e67_validate", "e72_incremental_agg",
    "e77_chunk_documents", "e78_mad_outliers", "e79_incremental_distinct",
]

# Round-5 window (all driver-checked in CORRECTNESS_r05; audit trail).
_R5_WINDOW = [
    "p21_errors", "p10", "e03_neardup_minhash", "e07_multimodal_meta",
    "e89_containment", "e161_source_diversity", "e229_fim_transform",
    "p26", "p26b",
    "e170_wav_decode", "e174_audio_features", "e175_image_stats",
    "e178_audio_downsample", "e179_image_gray", "e182_audio_mixdown",
    "e189_audio_trim",
    "e54_kmeans", "e96_denormalize", "e103_triangle_stats",
    "e107_pagerank", "e136_label_propagation", "e113_bpe_learn",
    "e114_bpe_encode", "e127_duplicated_spans", "e133_remove_dup_spans",
    "e50_range_join", "e230_length_batches",
    "e24_asof_join", "e36_bm25_topk", "e47_salted_join", "e53_debounce",
    "e56_unigram_lm", "e64_transition_matrix", "e68_inverted_index",
    "e71_knn_pq", "e71b_knn_pq_rerank", "e73_fuzzy_match",
    "e76_heavy_hitters", "e80_cms_frequency", "e83_dsir_select",
    "e92_line_dedup", "e95_random_projection", "e101_user_journeys",
    "e109_quality_classifier", "e117_image_neardup",
    "e144_sorted_neighborhood", "e171_html_extract", "e195_k_anonymity",
    "e197_dp_count",
]

# Round-4 window (all driver-checked in CORRECTNESS_r04; audit trail).
_R4_WINDOW = [
    # (a) round-3 reds, fixed
    "e61_weighted_sample", "e152_roc_auc",
    # (b) round-3 session-7/8 operators, gate-replica-only so far
    "e213_threshold_select", "e214_ipw_ate", "e215_jackknife_ratio",
    "e216_image_equalize", "e217_bpe_roundtrip", "e218_class_separability",
    "e219_audio_gain", "e220_image_otsu", "e221_ood_scores",
    "e222_char_gibberish", "e223_markov_attribution", "e224_group_quantiles",
    "e225_zipf_fit", "e226_curation_pipeline", "e227_robust_scale",
    "s13_stream_session_native",
    # (c) streaming sweep: the last driver-unchecked S-queries
    "s07_stream_ewma", "s08_stream_quantile", "s09_stream_enrich",
    "s10_stream_upsert", "s11_stream_interval_join_outer",
    "s12_stream_window_distinct",
    # (d) HUGEINT-cast oracles (round-4 fix, previously latent reds)
    "e32_chunk_dedup", "e38_ngram_decontam", "e41_profile",
    "e42_token_entropy", "e135_join_size_estimate", "e137_kaplan_meier",
    "e138_classification_report", "e139_rendezvous_rebalance",
    "e140_anova", "e141_mannwhitney", "e148_plan_compaction",
    "e154_vocab_richness", "e155_brier", "e159_trending_keys",
    "e167_dedup_savings", "e185_audio_fingerprint", "e187_image_dhash",
    "e199_pii_report",
    # (e) heavy-logic never-checked (round-3 verdict item 3) + the
    # round-4 PNG codec (e113_bpe_learn yields its slot: e217's
    # roundtrip drives learn+encode+decode end-to-end this window)
    "e31_dup_clusters", "e57_semdedup", "e228_png_decode",
]

# Round-3 window (all driver-checked in CORRECTNESS_r03; kept for the
# audit trail of what each round's 50-slot gate covered).
_R3_WINDOW = [
    # new or changed in round 3
    "s01_stream_pivot", "s02_stream_dedup", "s03_stream_session",
    "s04_stream_debounce", "s05_stream_interval_join", "s06_stream_topk",
    "e168_ppm_decode", "e169_bmp_decode",
    "e123_tfidf_cosine_join", "e124_pmi_cooccurrence",
    "e61_weighted_sample", "e125_readability",
    # graph family (now on the shared mined-pair stage; e31 rotates to
    # round 4 — the round-2 judge already gate-replica-verified it.
    # e107/e116/e136/e162 rotate to round 4 too: all four are thin
    # consumers of the same mined-pair stage that e115/e157 exercise
    # here, freeing slots for the session-6/7 brand-new operators)
    "e82_dedup_keep_best",
    "e115_leakage_safe_split", "e157_cross_source_dups",
    # verdict-named heavy-logic families, not yet driver-checked
    # (e57/e103/e113/e133 rotate to round 4 — the round-2 judge already
    # ran the gate-replica comparison on them, so the freed slots go to
    # this session's brand-new operators e191-e194)
    "e69_scd2_build", "e70_scd2_apply",
    "e81_spearman_matrix",
    "e134_poisson_bootstrap",
    "e146_cdf_transform", "e152_roc_auc",
    # additional unchecked heavy-logic operators (e32/e35/e36/e38/e41/
    # e54/e56 rotate to round 4 — unit-tested and oracle-declared
    # meanwhile; e38's decontam family already has driver-green e23)
    "e75_bloom_decontam", "e85_bigram_lm",
    "e129_neardup_incremental",
    # session-4 perceptual-fingerprint family: the two end-to-end
    # neardup queries stay (each exercises its fingerprint + the
    # generic hamming band join); the standalone fingerprint/trim/crop
    # queries rotate to round 4 (decode-back oracles + randomized batch
    # tests cover them meanwhile)
    "e186_audio_neardup", "e188_image_neardup_dhash",
    # session-3 new operators — newest code gets the hard signal first
    # (e47/e50/e66/e72/e174 rotate to round 4; they are unit-tested and
    # oracle-declared meanwhile)
    "e176_boilerplate_lines",
    "e180_semantic_decontam", "e181_media_sniff",
    # session-5 new operators: retrieval eval, curriculum order,
    # blur / spectral media screens
    "e191_ranking_ndcg", "e192_curriculum_order",
    "e193_image_blur", "e194_audio_spectral",
    # session-6 new operators: preference ranking + MinHash audit
    # (e127 rotates to round 4 — judge gate-replica-verified in r02)
    "e201_bradley_terry", "e202_minhash_audit",
    # session-6 (cont.): normalization, media, LM and audit operators
    "e203_quantile_normalize", "e204_contrast_stretch",
    "e205_stupid_backoff", "e206_cohens_kappa", "e207_fps_coreset",
    # session-7 new operators: isotonic calibration, graph lcc,
    # Krippendorff agreement, T5 span corruption, Matryoshka recall
    "e208_isotonic_calibration", "e209_local_clustering",
    "e210_krippendorff_alpha", "e211_span_corruption",
    "e212_matryoshka_recall",
    # (e213-e224 + s13 — threshold sweep, IPW, jackknife, equalize,
    # BPE roundtrip, class separability, WAV gain, Otsu, OOD,
    # gibberish, Markov attribution, group quantiles, native session
    # window — are gate-replica-verified this session and head the
    # round-4 rotation)
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: two-pivot-column sum over lineitem at sf0.001."""
    from pivot_spark.plans.declared import QUERIES

    return QUERIES["p17"](spark, "/root/testdata/sf0.001")


def _ordered() -> "dict[str, Callable[[SparkSession, str], DataFrame]]":
    from pivot_spark.plans.declared import QUERIES

    front = _CANARIES + [q for q in _ROUND_WINDOW if q not in _CANARIES]
    missing = [q for q in front if q not in QUERIES]
    assert not missing, f"window names not in QUERIES: {missing}"
    out = {name: QUERIES[name] for name in front}
    for name, fn in QUERIES.items():
        out.setdefault(name, fn)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered()


def oracle_sql() -> dict[str, str]:
    from pivot_spark.plans.declared import ORACLES

    return dict(ORACLES)
