"""PySpark-native analytics engine with the query/data-processing
capabilities of PDXostc/rvi_big-data_api, re-expressed Spark-first.

Importing this package populates the query registry (each operator module
registers its SURVEY.md §2 entries on import).
"""

from __future__ import annotations

from .registry import REGISTRY, oracles, queries  # noqa: F401
from .session import get_spark  # noqa: F401

# Operator modules register queries on import; keep this list in sync with
# SURVEY.md §2's sections.
from .functions import scalars, udfs  # noqa: F401,E402
from .sources import formats  # noqa: F401,E402
from .streaming import streams  # noqa: F401,E402
from .operators import (  # noqa: F401
    aggregates,
    analytics,
    filters,
    joins,
    llm_dedup,
    llm_sim,
    llm_text,
    ml_eval,
    multimodal,
    setops,
    sorts,
    subqueries,
    telemetry,
    windows,
)  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Registry presentation order.
#
# The driver's per-round correctness pass walks `queries()` in registration
# order and has a finite budget (round 1 recorded exactly the first 50
# entries — CORRECTNESS_r01.json / VERDICT.md). Import order above is
# module-granular, so we impose an explicit query-granular order here:
# families with no driver correctness row yet come FIRST, already-green
# families last. Pinned by tests/test_registration_order.py so a refactor
# can't silently push unverified operators past the driver's horizon.
# ---------------------------------------------------------------------------
PRIORITY_UNVERIFIED: list[str] = [
    # -- round-12 head (refreshed per VERDICT r11 item 2): CORRECTNESS_r11
    # consumed the entire previous 32-entry head — 50/50 hash-pass — and the
    # registry again has zero driver-coverage debt (VERDICT r11: 494
    # hash-pass latest + 6 rows-only by design). The unverified head is
    # therefore EMPTY: round-12 additions registered here go straight to the
    # front of the driver's 50-row budget. ----------------------------------
    "ml_gmm_quality", "corpus_gmm_posterior_sample",
    "corpus_curated_select",
    "stats_kendall_tau", "ts_mann_kendall", "ml_gmm_bic",
    "stream_gmm_quality_gate",
    "ml_cox_ph",
    "ts_granger_lag1", "text_burstiness",
    "stats_g_test", "ts_hurst_rs",
    "text_bm25_topk", "sim_hybrid_rrf",
    "win_drawdown", "eval_hybrid_gain",
    "stream_drawdown_monitor", "eval_calibration_spiegelhalter",
    "corpus_mix_anneal",
    "ml_ridge_regression", "graph_ppr",
    "stream_ridge_online",
]

PRIORITY_VERIFIED: list[str] = [
    # -- driver-green in round 11 (CORRECTNESS_r11.json, 50 rows, all hash
    # matches, zero err — all 32 round-11 additions plus 18 re-samples of
    # ADVICE-touched/r10-wave entries already listed below) ------------------
    "eval_bradley_terry", "text_lang_id", "stream_seasonal_esd",
    "stats_spearman", "text_readability", "eval_brier_decomposition",
    "ts_periodogram", "stream_lang_drift",
    "stats_friedman", "eval_isotonic_calibration",
    "scan_snapshot_timetravel", "privacy_entropy_ldiv",
    "agg_distinct_growth", "stats_proportion_ztest",
    "corpus_quality_classifier", "stream_distinct_growth",
    "composite_price_volume_mix", "corpus_reward_mix",
    "win_skyline_pareto", "text_kneser_ney", "seq_window_funnel",
    "eval_langid_kappa", "ts_theil_sen", "corpus_classifier_filter",
    "ts_unit_root_df", "stats_bartlett", "eval_mcc", "ts_holt_winters",
    "text_heaps_law", "stats_cochran_q", "eval_tost_equivalence",
    "stream_decayed_topk",
    # -- driver-green in round 10 (CORRECTNESS_r10.json, 50 rows, all hash
    # matches, zero err — the 4-entry round-9 tail head plus all 17 oracled
    # round-10 additions; the remaining 29 rows re-sampled earlier-round
    # entries already listed below) ------------------------------------------
    "corpus_seqlen_sweep", "sink_snapshot_gc", "mm_cdc_containment",
    "text_entropy_rate",
    "mm_cdc_clamped", "text_unigram_train", "text_unigram_apply",
    "stats_wilcoxon_signrank", "eval_sequential_msprt", "eval_ratio_delta_ci",
    "stream_msprt_monitor", "ts_forecast_backtest", "stats_kaplan_meier",
    "anomaly_seasonal_esd", "corpus_tokenizer_compare", "ml_logreg_train",
    "eval_counterfactual_ips", "eval_diff_in_differences",
    "eval_auc_delong", "stream_forecast_anomaly", "sink_snapshot_rollback",
    # -- driver-green in round 9 (CORRECTNESS_r09.json, 50 rows, all hash
    # matches, zero err — the 24 round-8 additions, the dedup_embed_pinned8
    # rename, and the first 25 round-9 additions) ----------------------------
    "agg_log_histogram_quantile", "corpus_preference_pairs",
    "corpus_length_buckets", "er_record_linkage", "corpus_dataset_card",
    "ts_sax", "eval_lift_table", "graph_hits",
    "stats_permutation_test", "ts_changepoint_binseg", "mm_audio_energy",
    "stream_funnel_sessions", "sink_parquet_bloom", "stream_dirty_linkage",
    "stream_log_histogram", "privacy_dp_mean", "stream_ab_experiment",
    "corpus_curriculum_order", "anomaly_rate_poisson", "eval_pass_at_k",
    "text_bpe_train", "scan_snapshot_manifest", "text_bpe_apply",
    "graph_modularity", "dedup_embed_pinned8",
    "mm_cdc_dedup", "text_substring_dedup", "privacy_dp_quantile",
    "mm_cdc_incremental", "corpus_bpe_fertility", "ts_motif_discovery",
    "anomaly_subsequence_discord", "corpus_substring_scrub",
    "stream_cdc_ingest", "win_regression_slope", "eval_pinball_loss",
    "stream_contamination_guard", "eval_er_quality", "privacy_generalize",
    "sink_snapshot_commit", "eval_ab_cuped", "graph_link_prediction",
    "scan_manifest_prune", "stream_reservoir_sample",
    "eval_experiment_power", "seq_longest_streak", "mm_scene_cuts",
    "profile_activity_matrix", "eval_trimmed_mean", "corpus_dataset_diff",
    # -- driver-green in round 8 (CORRECTNESS_r08.json, 50 rows, all hash
    # matches, zero err — includes the fn_geospatial re-check after the
    # sticky-conf fix, clearing the only red row in the project's history) --
    "fn_geospatial",
    "anomaly_cusum", "profile_crosstab", "seq_transition_matrix",
    "ab_experiment_report", "fleet_daily_report",
    "text_zipf_fit", "text_novelty_score", "clean_impute",
    "sink_compaction", "mm_manifest_join", "win_range_numeric",
    "fn_crypto", "fn_map_hof", "fn_array_set", "fn_xpath", "fn_csv_inline",
    "agg_bitops", "scan_xml", "sql_scripting", "sql_identifier_dynamic",
    "subquery_scalar_df", "udtf_table_arg", "udf_arrow_optimized",
    "udtf_cogrouped_map", "limit_offset",
    "dedup_simhash_verify", "agg_countmin", "agg_bloom_filter",
    "cdc_snapshot_diff", "agg_incremental_merge", "stats_kruskal_wallis",
    "feature_woe", "privacy_suppression", "geo_dbscan_grid",
    "ts_cross_correlation", "geo_cotravel", "ts_seasonal_strength",
    "agg_quantile_histogram", "eval_mcnemar_paired", "seq_markov_holdout",
    "profile_correlation_matrix", "stream_quantile_histogram",
    "geo_dwell_segments", "stats_effect_sizes", "mm_phash_band",
    "stream_geo_sessions", "sample_weighted",
    "corpus_multimodal_pipeline",
    # -- driver-green in round 7 (CORRECTNESS_r07.json, 50 rows: 49 hash
    # matches; fn_geospatial's error row superseded by its r08 re-check) ----
    "source_inmemory",
    "stream_rocksdb_state", "scan_state_store", "stream_dedup_watermark",
    "sink_stream_python_datasource", "stream_sketch_distinct",
    "stream_observe_metrics", "stream_incremental_resume",
    "stream_psi_drift", "stream_stateful_rocksdb", "stream_corpus_pipeline",
    "corpus_perplexity_filter", "corpus_training_pipeline",
    "corpus_global_shuffle", "corpus_drift_psi", "corpus_diverse_sample",
    "corpus_dedup_report", "corpus_split_leakage_safe",
    "stats_ttest_welch", "stats_chi2_independence",
    "agg_ks_test", "agg_mannwhitney_u", "agg_benford_check", "agg_gini",
    "agg_weighted_median", "agg_approx_top_k", "agg_theta_retention",
    "agg_distinct_salted",
    "geo_grid_density", "geo_od_matrix", "geo_flow_matrix",
    "graph_kcore", "graph_jaccard_neighbors", "graph_label_propagation",
    "knn_graph_mutual",
    "embed_pq_codebook", "sim_adc_topk", "embed_pca_power",
    "embed_outlier_score", "embed_hygiene_audit",
    "dedup_embed_bandor", "dedup_containment", "dedup_incremental",
    "sim_maxsim_multivector",
    "cdc_scd2", "privacy_k_anonymity", "profile_key_skew",
    "seq_pattern_detect", "event_attribution",
    # -- driver-green in round 6 (CORRECTNESS_r06.json, 50 rows, all hash
    # matches, zero err) ----------------------------------------------------
    "dedup_near_verify", "fn_variant_explode", "graph_bfs_distance",
    "eval_matryoshka_recall", "feature_onehot", "sim_hard_negatives",
    "scan_glob_recursive", "sql_pivot_unpivot", "anomaly_seasonal_naive",
    "graph_closeness", "stats_anova_oneway", "ts_autocorrelation",
    "graph_clustering_coefficient", "stats_levene", "geo_nearest_poi",
    "ts_holt_linear", "stats_bootstrap_ci", "privacy_pseudonymize",
    "mm_content_dedup", "text_jsd_drift", "ts_period_over_period",
    "graph_assortativity", "ts_decompose_classical",
    "eval_fairness_report", "scan_csv_gzip",
    "embed_random_projection", "geo_track_simplify",
    "sql_group_order_all", "privacy_dp_histogram",
    "dedup_threshold_sweep", "eval_mmr_diversify",
    "eval_auc_trapezoid", "eval_brier_score", "embed_centroid_drift",
    "text_vocab_coverage",
    "eval_retrieval_metrics", "eval_classification_report",
    "eval_calibration_bins", "eval_regression_metrics", "eval_ab_srm_check",
    "eval_rank_correlation", "eval_roc_curve", "eval_pr_curve",
    "eval_cohens_kappa", "eval_lsh_candidate_quality", "eval_pq_recall",
    "feature_hashing", "feature_scaling", "feature_target_encode",
    "feature_quantile_bin",
    # -- driver-green in round 5 (CORRECTNESS_r05.json, 50 rows, all hash
    # matches, zero err) ----------------------------------------------------
    "sql_pipe_syntax", "fn_collation", "udtf_analyze",
    "sink_partition_overwrite", "text_span_dedup", "corpus_quality_pipeline",
    "corpus_pack_sequences", "embed_quantize", "fn_interval", "agg_listagg",
    "observe_metrics", "join_hinted", "stream_stream_outer_join",
    "scan_file_metadata", "agg_boolean", "sql_exec_immediate",
    "text_chunk_overlap", "corpus_shard_split", "corpus_importance_sample",
    "dedup_cluster_pd", "data_quality_checks", "agg_mode", "sql_udf",
    "fn_url", "embed_covariance", "join_lateral_df", "agg_transpose",
    "scan_binaryfile", "dedup_embed_cluster", "fn_timezone",
    "feature_pit_training", "feature_rolling_windows",
    "eval_ann_recall", "corpus_bpe_pairs", "join_null_safe", "sql_table_fn",
    "anomaly_mad", "sim_topk_multiprobe", "agg_session_window",
    "corpus_source_cap", "fn_try", "win_running_distinct",
    "graph_degree_stats", "scan_csv_quarantine", "sink_python_datasource",
    "resample_ohlc", "text_cooccurrence_pmi", "corpus_epoch_schedule",
    "set_multiset_ops", "agg_grouping_sets_df",
    # -- driver-green in round 4 (CORRECTNESS_r04.json, 50 rows: 49 hash
    # matches + agg_sketch_rollup rows-only by design, zero err) ------------
    "join_salted", "mm_chunk_bytes",
    "state_intervals", "clean_winsorize", "graph_pagerank",
    "sim_rerank", "corpus_dedup_pipeline", "profile_table",
    "agg_moments", "win_ewma", "join_asof_forward", "udtf_grouped_arrow",
    "stream_topk",
    "composite_forecast_revenue", "composite_volume_shipping",
    "composite_product_profit", "composite_important_parts",
    "composite_shipmode_priority", "composite_parts_supplier_counts",
    "composite_small_qty_revenue", "composite_large_orders",
    "composite_discounted_revenue", "composite_excess_suppliers",
    "composite_sole_supplier", "composite_segment_opportunity",
    "composite_min_price_supplier",
    "sim_pairs_gemm", "agg_entropy", "graph_triangle_count", "sink_zorder",
    "join_asof_nearest", "agg_sketch_rollup", "scan_schema_evolution",
    "trip_distance", "geo_geofence", "sim_range",
    "cdc_merge", "agg_bitmap_distinct", "agg_correlation",
    "source_python_datasource", "stream_python_source",
    "fn_variant", "sql_parameterized", "pandas_api_pipeline", "sql_lateral",
    "sql_recursive", "text_fuzzy_join", "scan_text_lines",
    "stream_merge_sink", "join_bloom_pruned",
    # -- driver-green in round 3 (CORRECTNESS_r03.json, 50 rows, all hash
    # matches, zero err) ----------------------------------------------------
    "sim_topk", "sim_pairs", "knn_label", "multimodal_struct", "sim_topk_ann",
    "text_tokenize", "text_tfidf", "text_stats", "text_quality",
    "text_langid", "text_fingerprint",
    "mm_binary_meta", "mm_decode_stub", "mm_frame_sample",
    "sample_stratified", "dedup_embed", "text_pii_mask", "corpus_token_budget",
    "composite_shipping_priority", "composite_order_priority",
    "composite_local_supplier_revenue", "composite_promo_revenue",
    "composite_top_supplier", "composite_customer_dist",
    "composite_returned_revenue", "composite_market_share",
    "text_contamination", "text_normalize", "text_repetition",
    "embed_centroids", "sim_ivf_kmeans",
    "anomaly_zscore", "event_funnel", "retention_cohort",
    "scan_orc", "scan_csv_malformed", "sink_sorted_parquet",
    "stream_anomaly",
    "join_asof_tolerance", "agg_unpivot", "win_median",
    "sink_bucketed", "udtf_map_arrow", "fn_regexp",
    "resample_interp", "scan_dpp", "join_interval_overlap",
    "text_ngram_lm", "corpus_mix_weights",
    "stream_latest_per_key",
    # -- driver-green in round 2 (CORRECTNESS_r02.json, 50 rows) ------------
    "project_compute", "filter_eq", "filter_range_time", "filter_compound",
    "filter_null", "distinct_rows", "sample_frac",
    "join_broadcast", "join_shuffle", "join_multiway", "join_left",
    "join_full", "join_semi", "join_anti", "join_cross", "join_theta",
    "join_asof", "join_interval", "join_self",
    "win_rank", "win_ntile", "win_lag_lead", "win_running",
    "win_sliding_rows", "win_range_time", "win_first_last", "win_pct",
    "sort_multi", "limit_global", "topk_per_group", "topk_global_agg",
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "trip_sessionize", "trip_stats", "latest_per_key", "resample_bucket",
    "threshold_runs", "gap_report", "haversine_dist", "daily_active",
    "resample_ffill",
    "dedup_exact", "dedup_hash", "dedup_near", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_cluster",
    # -- driver-green in round 1 (CORRECTNESS_r01.json, 50 rows) ------------
    "agg_pricing_summary", "agg_basic", "agg_count_distinct",
    "agg_approx_distinct", "agg_filtered", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_collect", "agg_percentile", "agg_stats",
    "agg_minmax_by", "agg_pivot", "agg_global", "agg_histogram",
    "project_prune",
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_array",
    "fn_map", "fn_json", "fn_hash", "fn_cast", "fn_bitwise",
    "udf_row", "udf_pandas_scalar", "udaf_pandas_agg", "udtf_grouped_map",
    "udtf_map_partitions", "udtf_python",
    "scan_parquet", "scan_csv", "scan_json", "scan_partitioned",
    "sink_parquet",
    # (source_inmemory demoted to PRIORITY_UNVERIFIED in round 6: its only
    # driver row is the pre-oracle r01 `no_oracle` record; the SQL twin added
    # later has never been driver-hash-checked — VERDICT r5 "What's wrong".)
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_static_join", "stream_stream_join", "stream_output_modes",
    "source_stream_files", "sink_stream_foreachbatch", "stream_stateful",
    "stream_late_data", "stream_resample",
]

REGISTRY_PRIORITY: list[str] = PRIORITY_UNVERIFIED + PRIORITY_VERIFIED


def _apply_registry_priority() -> None:
    unknown = [n for n in REGISTRY_PRIORITY if n not in REGISTRY]
    if unknown:
        raise RuntimeError(f"REGISTRY_PRIORITY names unregistered queries: {unknown}")
    # New queries not yet in the priority list register ahead of the
    # already-verified tail (they need a driver row soonest) but after the
    # explicitly prioritised unverified block.
    stragglers = [n for n in REGISTRY if n not in REGISTRY_PRIORITY]
    ordered = {n: REGISTRY[n] for n in PRIORITY_UNVERIFIED}
    ordered.update({n: REGISTRY[n] for n in stragglers})
    ordered.update({n: REGISTRY[n] for n in PRIORITY_VERIFIED})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_registry_priority()

__all__ = [
    "REGISTRY", "REGISTRY_PRIORITY", "PRIORITY_UNVERIFIED", "PRIORITY_VERIFIED",
    "queries", "oracles", "get_spark",
]
