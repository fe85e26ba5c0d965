"""Contract-coverage gate: the registry must contain every operator declared
in SURVEY.md §2 (the driver's checklist), each with either a DuckDB oracle or
an explicit rows-only registration — and no query may silently lose its
oracle."""

from __future__ import annotations

from rvi_big_data_api_spark.registry import REGISTRY

SURVEY_S2_INVENTORY = [
    # §2.1 scans, sources, sinks
    "scan_parquet", "scan_csv", "scan_json", "scan_partitioned", "sink_parquet",
    "source_stream_files", "sink_stream_foreachbatch", "source_inmemory",
    # §2.2 projection, filter, predicates
    "project_prune", "project_compute", "filter_eq", "filter_range_time",
    "filter_compound", "filter_null", "distinct_rows", "sample_frac",
    # §2.3 joins
    "join_broadcast", "join_shuffle", "join_multiway", "join_left", "join_full",
    "join_semi", "join_anti", "join_cross", "join_theta", "join_asof",
    "join_interval", "join_self",
    # §2.4 aggregations
    "agg_basic", "agg_pricing_summary", "agg_count_distinct", "agg_approx_distinct",
    "agg_filtered", "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_collect",
    "agg_percentile", "agg_stats", "agg_minmax_by", "agg_pivot", "agg_global",
    # §2.5 windows
    "win_rank", "win_ntile", "win_lag_lead", "win_running", "win_sliding_rows",
    "win_range_time", "win_first_last", "win_pct",
    # §2.6 sorts, limits, top-k
    "sort_multi", "limit_global", "topk_per_group", "topk_global_agg",
    # §2.7 set operations
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    # §2.8 scalar function suites
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_array",
    "fn_map", "fn_json", "fn_hash", "fn_cast",
    # §2.9 telemetry / domain
    "trip_sessionize", "trip_stats", "latest_per_key", "resample_bucket",
    "threshold_runs", "gap_report", "haversine_dist", "daily_active",
    # §2.10 LLM pipeline
    "dedup_exact", "dedup_hash", "dedup_near", "sim_topk", "sim_pairs",
    "knn_label", "text_tokenize", "text_tfidf", "text_stats", "text_quality",
    "multimodal_struct",
    # §2.11 streaming
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_stateful", "stream_static_join", "stream_stream_join",
    "stream_late_data", "stream_output_modes",
    # §2.12 UDF surface
    "udf_row", "udf_pandas_scalar", "udaf_pandas_agg", "udtf_grouped_map",
    "udtf_map_partitions", "udtf_python",
]

# Beyond the SURVEY inventory (BASELINE.json:6 north-star extensions).
EXTENSIONS = [
    "mm_binary_meta", "mm_decode_stub", "mm_frame_sample",
    "text_langid", "text_fingerprint", "sim_topk_ann",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_cluster", "resample_ffill",
    "stream_resample", "fn_bitwise", "agg_histogram",
    # round 2: embedding-cosine dedup + corpus-construction ops
    "dedup_embed", "sample_stratified", "text_pii_mask", "corpus_token_budget",
    # round 2: composite analytics suite (operators/analytics.py)
    "composite_shipping_priority", "composite_order_priority",
    "composite_local_supplier_revenue", "composite_promo_revenue",
    "composite_top_supplier", "composite_customer_dist",
    "composite_returned_revenue", "composite_market_share",
    # round 2: contamination / normalization / repetition / centroids / k-means
    "text_contamination", "text_normalize", "text_repetition",
    "embed_centroids", "sim_ivf_kmeans",
    # round 2: telemetry analytics (anomaly / funnel / retention)
    "anomaly_zscore", "event_funnel", "retention_cohort",
    # round 2: format surface (ORC, malformed CSV, clustered sink)
    "scan_orc", "scan_csv_malformed", "sink_sorted_parquet",
    # round 2: stateful streaming anomaly detector
    "stream_anomaly",
    # round 2: relational depth (tolerance as-of, unpivot, rolling median)
    "join_asof_tolerance", "agg_unpivot", "win_median",
    # round 2: bucketed co-located join sink, Arrow-native map, regexp suite
    "sink_bucketed", "udtf_map_arrow", "fn_regexp",
    # round 2: linear-interpolation resample
    "resample_interp",
    # round 2: dynamic partition pruning + interval-overlap join
    "scan_dpp", "join_interval_overlap",
    # round 2: bigram LM + training-mix planner
    "text_ngram_lm", "corpus_mix_weights",
    # round 2: streaming current-state table + explicit salted skew join
    "stream_latest_per_key", "join_salted",
    # round 2: multimodal blob sharding
    "mm_chunk_bytes",
    # round 2: state-channel compression + winsorization
    "state_intervals", "clean_winsorize",
    # round 2: similarity-graph PageRank (third iterative family)
    "graph_pagerank",
    # round 2: two-stage retrieval + end-to-end dedup flagship
    "sim_rerank", "corpus_dedup_pipeline",
    # round 2: one-pass table profiler
    "profile_table",
    # round 2: raw-moment statistics + exponentially-weighted smoothing
    "agg_moments", "win_ewma",
    # round 2: forward as-of + Arrow grouped map
    "join_asof_forward", "udtf_grouped_arrow",
    # round 2: streaming leaderboard
    "stream_topk",
    # round 3: subquery-shape suite (operators/subqueries.py) — the
    # remaining TPC-H shapes (Q2/6/7/9/11/12/16/17/18/19/20/21/22 adapted)
    "composite_forecast_revenue", "composite_volume_shipping",
    "composite_product_profit", "composite_important_parts",
    "composite_shipmode_priority", "composite_parts_supplier_counts",
    "composite_small_qty_revenue", "composite_large_orders",
    "composite_discounted_revenue", "composite_excess_suppliers",
    "composite_sole_supplier", "composite_segment_opportunity",
    "composite_min_price_supplier",
    # round 3: Arrow chunk-pair GEMM twin of sim_pairs
    "sim_pairs_gemm",
    # round 3: entropy profile, triangle counting, z-order layout
    "agg_entropy", "graph_triangle_count", "sink_zorder",
    # round 3: nearest as-of + mergeable-HLL rollup
    "join_asof_nearest", "agg_sketch_rollup",
    # round 3: mergeSchema read across file generations
    "scan_schema_evolution",
    # round 3: per-trip path length + geofence classification
    "trip_distance", "geo_geofence",
    # round 3: radius similarity search
    "sim_range",
    # round 3: batch MERGE upsert + exact bitmap distinct
    "cdc_merge", "agg_bitmap_distinct",
    # round 3: raw-sums cross-channel correlation
    "agg_correlation",
    # round 3: Spark-4 Python DataSource custom connector (batch + stream)
    "source_python_datasource", "stream_python_source",
    # round 3: VariantType payloads + parameterized/IDENTIFIER SQL
    "fn_variant", "sql_parameterized",
    # round 3: pandas-on-Spark API surface
    "pandas_api_pipeline",
    # round 3: correlated LATERAL through the SQL entry point
    "sql_lateral",
    # round 3: recursive CTE (Spark 4 WITH RECURSIVE)
    "sql_recursive",
    # round 3: banded levenshtein fuzzy join
    "text_fuzzy_join",
    # round 3: raw text-line ingestion (completes the format matrix)
    "scan_text_lines",
    # round 4: streaming foreachBatch idempotent MERGE (the lakehouse write
    # pattern) + runtime Bloom-filter join pruning (the 100 TB semi-join
    # accelerator)
    "stream_merge_sink", "join_bloom_pruned",
    # round 4: Spark-4 SQL surfaces (pipe syntax, collation-aware grouping,
    # polymorphic UDTF with analyze + TABLE args) + dynamic partition
    # overwrite (the incremental-backfill sink)
    "sql_pipe_syntax", "fn_collation", "udtf_analyze",
    "sink_partition_overwrite",
    # round 4: corpus-construction depth — C4-style span-level dedup, the
    # end-to-end quality-gate manifest, concat-and-chop sequence packing,
    # and the int8 embedding-quantization audit
    "text_span_dedup", "corpus_quality_pipeline", "corpus_pack_sequences",
    "embed_quantize",
    # round 4: interval arithmetic, ANSI LISTAGG, Observation-API metrics,
    # join-strategy hints, and the left-outer stream-stream join
    "fn_interval", "agg_listagg", "observe_metrics", "join_hinted",
    "stream_stream_outer_join",
    # round 4: file-provenance metadata columns, boolean aggregate family,
    # dynamic SQL via EXECUTE IMMEDIATE
    "scan_file_metadata", "agg_boolean", "sql_exec_immediate",
    # round 4 fourth wave: corpus construction (chunking, sharding,
    # importance sampling), log-round connected components, declarative
    # data-quality expectations, deterministic mode, SQL-defined functions,
    # URL parsing, embedding covariance
    "text_chunk_overlap", "corpus_shard_split", "corpus_importance_sample",
    "dedup_cluster_pd", "data_quality_checks", "agg_mode", "sql_udf",
    "fn_url", "embed_covariance",
    # round 4 fourth wave, API-surface pair: DataFrame.lateralJoin
    # (correlated subquery via the programmatic API) and DataFrame.transpose
    # (metric-matrix reshape)
    "join_lateral_df", "agg_transpose",
    # round 4: whole-file binary ingestion (binaryFile datasource) — the
    # multimodal file-arrival floor, path-as-metadata + blob fingerprint
    "scan_binaryfile",
    # round 4: semantic duplicate clusters — CC over the cosine pair graph,
    # the embedding twin of dedup_cluster (closes the dedup matrix)
    "dedup_embed_cluster",
    # round 4: DST-aware timezone conversion (convert_timezone, Spark 4) —
    # the fleet-local-time primitive, ICU zone rules on both engines
    "fn_timezone",
    # round 4: point-in-time-correct feature assembly (leakage-guarded
    # training-set join via one per-entity window, not N as-of joins)
    "feature_pit_training",
    # round 4: multi-horizon trailing-range feature vectors (one shuffle
    # serves every horizon; RANGE …1 PRECEDING leakage guard on the time axis)
    "feature_rolling_windows",
    # round 4: ANN recall@k evaluation (exact vs bucket-restricted arms)
    # and one BPE merge-selection step over the word-frequency table
    "eval_ann_recall", "corpus_bpe_pairs",
    # round 4: null-safe equality join (eqNullSafe / IS NOT DISTINCT FROM —
    # the optional-key join that keeps the NULL group, still planned equi)
    "join_null_safe",
    # round 4: SQL-defined table function (RETURNS TABLE + LATERAL per-row
    # invocation — the catalog-native parameterized view)
    "sql_table_fn",
    # round 4: median-absolute-deviation outlier fences (the robust,
    # 50%-breakdown twin of anomaly_zscore)
    "anomaly_mad",
    # round 4: multi-probe ANN (Hamming-1 neighbor buckets via explode +
    # equi-join — the recall lever; never a popcount theta join)
    "sim_topk_multiprobe",
    # round 4: native batch session_window cross-validated against the
    # gaps-and-islands oracle; deterministic per-source contribution cap
    "agg_session_window", "corpus_source_cap",
    # round 4: try_* error-safe expression family (per-expression ANSI
    # NULL-on-error contract, hash-checked against structural guards)
    "fn_try",
    # round 4: running distinct-count window (first-seen flag + running sum
    # — the O(1)-per-row formulation; count(DISTINCT) OVER exists nowhere)
    "win_running_distinct",
    # round 4: similarity-graph degree histogram (the pre-flight diagnostic
    # that predicts which CC variant and cost model applies)
    "graph_degree_stats",
    # round 4: PERMISSIVE + _corrupt_record quarantine ingestion (the
    # keep-and-route half of the robust-CSV contract)
    "scan_csv_quarantine",
    # round 4: Python DataSource WRITER (two-phase task-write + driver
    # commit — the custom-egress half of source_python_datasource)
    "sink_python_datasource",
    # round 4: OHLC bar downsampling (rank-window open/close — the
    # reproducible alternative to partition-order-dependent first/last)
    "resample_ohlc",
    # round 4: PMI collocations over positional co-occurrence (per-doc
    # equi-join, integer counts until one final ln)
    "text_cooccurrence_pmi",
    # round 4: data-constrained epoch-repetition planner (integer weight
    # mass, 4-epoch cap — the budget-to-schedule step before sampling)
    "corpus_epoch_schedule",
    # round 4: multiset INTERSECT ALL / EXCEPT ALL (volume-aware set
    # algebra — the ALL variants the distinct ops deliberately omit)
    "set_multiset_ops",
    # round 5: Spark 4 DataFrame.groupingSets API twin (+grouping_id),
    # RocksDB state-store provider demo, state data source batch reader
    "agg_grouping_sets_df", "stream_rocksdb_state", "scan_state_store",
    # round 5: SQL scripting fixpoint loop, native XML round trip,
    # bounded-state dedup (dropDuplicatesWithinWatermark), Python
    # DataSource STREAMING writer (completes the connector matrix)
    "sql_scripting", "scan_xml", "stream_dedup_watermark",
    "sink_stream_python_datasource",
    # round 5: CCNet-style perplexity quality bucketing; two-phase salted
    # exact-distinct (the skew-proof count-distinct rewrite)
    "corpus_perplexity_filter", "agg_distinct_salted",
    # round 5: AES column encryption round trip (PII protection); numeric
    # RANGE window frames (value-band local aggregates)
    "fn_crypto", "win_range_numeric",
    # round 5: incremental ingest dedup — new batch gated against the
    # existing corpus index (exact hash + cross-corpus gram Jaccard)
    "dedup_incremental",
    # round 5: product-quantization codebook training (the IVF-PQ
    # compressor; per-subspace k-means with distortion audit) and the
    # asymmetric-distance top-k that queries it (LUT + code equi-join),
    # and the recall gate that certifies the compression loss
    "embed_pq_codebook", "sim_adc_topk", "eval_pq_recall",
    # round 5: map-tile heatmap rollup (floor-division grid cells, one
    # cell-keyed aggregate — the reference dashboard's density layer) and
    # the trip origin->destination matrix built on sessionized trips
    "geo_grid_density", "geo_od_matrix",
    # round 5: small-file compaction maintenance job (layout rewrite with
    # filesystem-verified before/after file counts + lossless row check)
    "sink_compaction",
    # round 5: end-to-end corpus assembly funnel (LM-quality gate -> exact
    # dedup -> source cap -> per-source token mass ledger)
    "corpus_training_pipeline",
    # round 5 continuation: Spark 4 subquery-expression DataFrame API
    # (scalar()/exists() with Column.outer(), decorrelated by Catalyst to
    # pushed-scalar + semi/anti joins), Theta-sketch day-over-day audience
    # set algebra (union/intersection/difference — the op HLL can't do),
    # and the deterministic salted-hash training-order interleave with its
    # per-block source-mix audit
    "subquery_scalar_df", "agg_theta_retention", "corpus_global_shuffle",
    # round 5 continuation: partitioned table-argument UDTF (fresh instance
    # per partition + engine-enforced ORDER BY + terminate() summary),
    # completing the §2.12 matrix beyond udtf_analyze's unpartitioned
    # TABLE() binding
    "udtf_table_arg",
    # round 5 continuation: multimodal pairing manifest (text corpus LEFT
    # JOIN embedding table on the shared key — per-source completeness,
    # paired token mass, observed embedding dim)
    "mm_manifest_join",
    # round 5 continuation: IDENTIFIER() dynamic-identifier binding +
    # GROUP BY ALL — the injection-safe third leg of the dynamic-SQL triad
    "sql_identifier_dynamic",
    # round 5 continuation: the fleet dashboard's daily rollup — activity,
    # trip starts, and anomaly counts composed from three derived
    # subsystems into one day-keyed report (broadcast-sized assembly)
    "fleet_daily_report",
    # round 5 continuation: Theta sketch INSIDE streaming aggregation state
    # — bounded-bytes per-window distinct over an unbounded stream, exact
    # vs the batch COUNT(DISTINCT) oracle in the fixture regime
    "stream_sketch_distinct",
    # round 5 continuation: embedding-table hygiene gate (dim consistency,
    # non-finite components, mean L2 norm, component range) — the audit
    # that certifies the normalization contract the sim_* ops rely on
    "embed_hygiene_audit",
    # round 5 continuation: tile-to-tile traffic flow (lag-based directed
    # transitions, same-cell hops dropped) — density/OD/flow completes the
    # map dashboard's geo layers
    "geo_flow_matrix",
    # round 5 continuation: observe() on an unbounded frame — per-batch
    # quality counters in query progress, merged batch-count-invariantly
    "stream_observe_metrics",
    # round 5 continuation: exactly-once across a restart — run 1 ingests
    # half the corpus into a checkpointed aggregation, run 2 resumes from
    # the same checkpoint over new files; final state equals the batch
    # aggregate (no replay, no gap)
    "stream_incremental_resume",
    # round 5 continuation, from the measured 10x sweep (SCALE.md): multi-
    # table band-OR sign-LSH pair generation — L=4 independent 8-bit tables
    # over disjoint dim slices, skinny band join, verify-dot after pair
    # dedup; the recall knob the single-table ops lack
    "dedup_embed_bandor",
    # round 5 continuation: pagination — ORDER BY ... LIMIT k OFFSET m via
    # DataFrame.offset; still TakeOrderedAndProject (bounded heap), with
    # keyset pagination documented as the deep-page path
    "limit_offset",
    # round 5 continuation: NULL repair — per-channel median imputation of
    # a deterministic md5 dropout mask (fixtures carry no NULLs), the FILL
    # leg of the cleaning suite next to anomaly_* (report) and
    # clean_winsorize (clip)
    "clean_impute",
    # round 5 continuation: Zipf's-law fit per language — log-log
    # regr_slope/regr_r2 over the ranked term-frequency head; a one-number
    # corpus-naturalness monitor
    "text_zipf_fit",
    # round 5 continuation: population-stability-index drift between two
    # corpus snapshots — smoothed doc-length histograms, per-bucket PSI
    # terms + total, post-agg windows over <=10 bucket rows
    "corpus_drift_psi",
    # round 5 continuation: mutual k-NN graph inside sign-bit quantizer
    # buckets — directed top-k per vector, mutuality by reversed-pair
    # equi-join; the sparsifier under semantic clustering/diversity ops
    "knn_graph_mutual",
    # round 5 continuation: first principal component by fixed-2-round
    # power iteration — covariance from power sums, broadcast matvecs,
    # centered projection, skewness-pinned sign; exact SQL twin
    "embed_pca_power",
    # round 5 continuation: leakage-safe train/val/test split — md5-nibble
    # bucketing applied to the near-dup CLUSTER representative (shared CC
    # machinery with dedup_cluster), so no near-duplicate pair ever
    # straddles train and eval; singletons represent themselves
    "corpus_split_leakage_safe",
    # round 5 continuation: semi-supervised label spread over the mutual-kNN
    # graph — clamped seeds, majority vote per round, 2 unrolled rounds,
    # same graph as knn_graph_mutual via the shared edge helper
    "graph_label_propagation",
    # round 5 continuation: directional n-gram containment — the asymmetric
    # dup measure (short doc quoted inside a long one) Jaccard misses;
    # normalized by the contained side's gram count only
    "dedup_containment",
    # round 5 continuation: ColBERT-style MaxSim late-interaction scoring —
    # sum over query subvectors of the max dot against any doc subvector,
    # broadcast query batch, top-k per query
    "sim_maxsim_multivector",
    # round 5 continuation: CEP-lite sequence-pattern detection — per-session
    # symbol strings (sessionize first, so regex input is session-bounded),
    # non-overlapping funnel-occurrence counts + error-taint flag
    "seq_pattern_detect",
    # round 5 continuation: streaming PSI drift monitor — windowed value
    # histograms maintained by ONE stateful aggregation, drift scored
    # against the static reference on the result table (batch stage)
    "stream_psi_drift",
    # round 5 continuation: diagonal-Mahalanobis embedding outlier scoring —
    # per-dim stats folded against each vector by a broadcast JVM zip_with
    # (one map-side pass); flag compares the ROUNDED hash-checked score
    "embed_outlier_score",
    # round 5 continuation: weighted median per channel from window algebra
    # (ordered running weight sum + group total over one shuffle) — exact,
    # no float rounding anywhere in the selection
    "agg_weighted_median",
    # round 5 continuation: per-doc corpus novelty — fraction of a doc's
    # distinct trigrams appearing in no other document; two 8-byte-key
    # shuffles, no pair list
    "text_novelty_score",
    # round 5 continuation: diversity-stratified sampling — top-k docs per
    # sign-bit quantizer bucket by a quality key; bucket-stratified MMR
    # cousin with zero pairwise similarity at selection time
    "corpus_diverse_sample",
    # round 5 continuation: Gini concentration per channel — exact
    # finite-sample formula from one rank window + one aggregate
    "agg_gini",
    # round 5 continuation: last-touch attribution — one user-keyed window
    # carries the latest non-purchase touch forward (IGNORE NULLS, the
    # resample_ffill discipline), channel rollup of purchase credit
    "event_attribution",
    # round 5 continuation (#300): deterministic A/B assignment + pooled
    # two-proportion z-test readout — hash-stable arms (never rand()),
    # two partial aggs then one-row arithmetic
    "ab_experiment_report",
    # round 5 continuation: ML-eval / feature-engineering family — ranking
    # metrics (MRR/precision/NDCG) over the sign-bit ANN arm, per-class
    # precision/recall for knn_label, stateless hashing-trick features,
    # per-group z/minmax/robust scaling, and Welch's t on hash-assigned arms
    "eval_retrieval_metrics",
    "eval_classification_report",
    "feature_hashing",
    "feature_scaling",
    "stats_ttest_welch",
    # second wave: confidence calibration for auto-labels, leakage-aware
    # (LOO + m-estimate) target encoding, OLS fit + RMSE/MAE/R² readout
    "eval_calibration_bins",
    "feature_target_encode",
    "eval_regression_metrics",
    # third wave: chi-square sample-ratio-mismatch guard, fitted
    # equal-width + quartile binning (fit/transform broadcast split)
    "eval_ab_srm_check",
    "feature_quantile_bin",
    # graph second-order ops: unrolled 2-core peel (CTE-mirrored, fixpoint
    # pinned by property test) and neighborhood-Jaccard link prediction
    "graph_kcore",
    "graph_jaccard_neighbors",
    # fourth wave: Spearman rho between exact/ANN orderings, Benford
    # first-digit forensics, and the three-rung dedup-funnel audit
    "eval_rank_correlation",
    "agg_benford_check",
    "corpus_dedup_report",
    # fifth wave: band-OR LSH candidate precision/recall vs exact all-pairs
    # truth (the collision model made queryable), two-sample KS distance
    "eval_lsh_candidate_quality",
    "agg_ks_test",
    # tie-corrected Mann-Whitney U completes the experiment-stat suite
    "agg_mannwhitney_u",
    # round-5 audit/conformance wave: ROC over the score support (AUC
    # pinned to Mann-Whitney by tests/test_audit_wave.py), rater
    # agreement, Markov transitions, window-form CUSUM, shuffle-skew
    # audit, RocksDB state-store conformance, SCD2 dimension build,
    # Arrow-optimized UDF, approx_top_k sketch, k-anonymity/l-diversity,
    # cogrouped applyInPandas, crosstab, streaming corpus-ingest funnel
    "eval_roc_curve", "eval_cohens_kappa", "seq_transition_matrix",
    "anomaly_cusum", "profile_key_skew", "stream_stateful_rocksdb",
    "cdc_scd2", "udf_arrow_optimized", "agg_approx_top_k",
    "privacy_k_anonymity", "udtf_cogrouped_map", "profile_crosstab",
    "stream_corpus_pipeline",
    # chi-square independence over the crosstab; PR curve twin of the ROC
    "stats_chi2_independence", "eval_pr_curve",
    # map higher-order functions (transform_values/map_filter/map_zip_with)
    "fn_map_hof", "fn_array_set", "agg_bitops",
    # row-level XML/CSV extraction siblings of scan_xml / scan_csv
    "fn_xpath", "fn_csv_inline",
    # Spark 4.1 GEOMETRY/GEOGRAPHY type surface (flag-gated WKB round trip)
    "fn_geospatial",
    # round 6: dedup_near's verify stage with a SQL twin — exact shingle-set
    # Jaccard over the inverted-index candidate superset (VERDICT r5 item 3)
    "dedup_near_verify",
    # round 6: variant_explode lateral TVF (sorted-key canonicalization +
    # compact to_json rendering pinned by the oracle)
    "fn_variant_explode",
    # round 6: multi-source frontier BFS hop distance from the per-block
    # canonical seed — the reach primitive next to CC/PageRank/k-core
    "graph_bfs_distance",
    # round 6: truncated-dimension (matryoshka) recall@k vs full-dim truth —
    # the third recall gate next to eval_ann_recall and eval_pq_recall
    "eval_matryoshka_recall",
    # round 6: fitted one-hot COO encoding (dictionary twin of the hashing
    # trick, offset-stacked multi-column blocks)
    "feature_onehot",
    # round 6: contrastive hard-negative mining — top-k cross-label cosine
    "sim_hard_negatives",
    # round 6: recursiveFileLookup + pathGlobFilter scan-option conformance
    "scan_glob_recursive",
    # round 6: SQL PIVOT/UNPIVOT clause round trip (syntax twins of the
    # DataFrame agg_pivot / agg_unpivot)
    "sql_pivot_unpivot",
    # round 6: seasonal-naive anomaly fence against the per-(type, hour)
    # integer-cents baseline — the seasonal member of the anomaly suite
    "anomaly_seasonal_naive",
    # round 6: closeness centrality (cluster-exemplar selection) via
    # per-block all-pairs vectorized BFS, integer-ppm ratios
    "graph_closeness",
    # round 6 continuation: K-sample mean test completing the two-sample
    # suite, the daily-series seasonality probe, and the per-node local
    # clustering coefficient (triangle family's third consumer)
    "stats_anova_oneway", "ts_autocorrelation", "graph_clustering_coefficient",
    # round 6 continuation: variance-homogeneity gate for ANOVA, exact
    # planar nearest-POI assignment, and recursive Holt level+trend
    # smoothing (applyInPandas vs linear recursive CTE, bit-exact gains)
    "stats_levene", "geo_nearest_poi", "ts_holt_linear",
    # round 6 continuation: single-pass Poisson bootstrap CI (the 100 TB
    # resampling shape) and peppered-hash pseudonymization (PII-safe
    # extract with referential integrity)
    "stats_bootstrap_ci", "privacy_pseudonymize",
    # round 6 continuation: binary-blob exact dedup over a two-shard
    # binaryFile lake (rule-18 hex hashing, min-(doc, shard) keeper)
    "mm_content_dedup",
    # round 6 continuation: token-distribution JSD drift (the what-is-said
    # companion to PSI's length histogram) and integer-ppm
    # period-over-period growth (lag-1 / lag-7 on the exact cents series)
    "text_jsd_drift", "ts_period_over_period",
    # round 6 continuation: per-block degree assortativity (graph mixing
    # summary) and all-integer classical trend/seasonal/residual
    # decomposition of the hourly series
    "graph_assortativity", "ts_decompose_classical",
    # round 6 continuation: group-fairness audit (per-cohort TPR/FPR/DI in
    # integer ppm) and GZIP csv codec round trip (non-splittable caveat)
    "eval_fairness_report", "scan_csv_gzip",
    # round 6 continuation: Johnson-Lindenstrauss sign projection (the
    # fit-free dim-reduction member of the embed family) and trajectory
    # cell-run simplification (streaming-safe Douglas-Peucker cousin)
    "embed_random_projection", "geo_track_simplify",
    # round 6 continuation: GROUP BY ALL / ORDER BY ALL inference
    # conformance and deterministic Laplace DP histogram release
    "sql_group_order_all", "privacy_dp_histogram",
    # round 6 continuation: tau-tuning pairs-vs-threshold curve (bit-exact
    # JVM fold, no GEMM margin caveat) and unrolled greedy MMR
    # diversification (bit-exact picks, candidate-set-only reranking)
    "dedup_threshold_sweep", "eval_mmr_diversify",
    # round 6 continuation: exact all-integer trapezoid AUC (ppm) and the
    # Brier proper scoring rule over the kNN confidence
    "eval_auc_trapezoid", "eval_brier_score",
    # round 6 continuation: per-label centroid displacement between corpus
    # snapshots — the embedding-space drift monitor beside PSI/JSD
    "embed_centroid_drift",
    # round 6 continuation: token-mass coverage at a vocab-size grid (the
    # tokenizer sizing curve; one explode, one vocab-sized window pass)
    "text_vocab_coverage",
    # round 7: dedup_simhash's full pipeline with a SQL twin — md5-derived
    # 64-bit term hash (PARITY rule 18 shared-md5 discipline) through the
    # same bit votes / pigeonhole chunk join / xor+bit_count Hamming verify
    # (VERDICT r6 item 7: the rows-only residue shrinks to the xxhash64
    # seeding alone)
    "dedup_simhash_verify",
    # round 7 wave 2: exactly-twinned hash sketches — the build, probe AND
    # error census hash-check against DuckDB (deterministic md5 row-hashes;
    # nothing estimates, only the interpretation is approximate)
    "agg_countmin", "agg_bloom_filter",
    # round 7 wave 2: pipeline/table maintenance — changeset derivation from
    # keyed snapshots (cdc_merge's inverse) and explicit partial-state merge
    # (the MV-maintenance monoid law, verified merge == recompute)
    "cdc_snapshot_diff", "agg_incremental_merge",
    # round 7 wave 2: stats/ML — rank ANOVA via histogram ranking (no global
    # row sort), WOE/IV categorical encoder, paired McNemar over the shared
    # kNN ranking
    "stats_kruskal_wallis", "feature_woe", "eval_mcnemar_paired",
    # round 7 wave 2: privacy enforcement (generalize-then-suppress — the
    # mechanism for privacy_k_anonymity's audit)
    "privacy_suppression",
    # round 7 wave 2: spatio-temporal analytics — grid-DBSCAN (map-side cell
    # fold + one union-find task over the geometry-bounded cell graph),
    # co-travel pair mining (inverted-index on (cell, day) stamps), spatial
    # gaps-and-islands dwell extraction
    "geo_dbscan_grid", "geo_cotravel", "geo_dwell_segments",
    # round 7 wave 2: time-series — lead-lag cross-correlation (integer
    # power sums), seasonal/trend strength on the all-integer decomposition,
    # held-out Markov perplexity (train/test split by time)
    "ts_cross_correlation", "ts_seasonal_strength", "seq_markov_holdout",
    # round 7 wave 2: exact mergeable quantiles via bounded-domain cents
    # histograms — batch and the streaming-state twin
    "agg_quantile_histogram", "stream_quantile_histogram",
    # round 7 wave 2: all-pairs measure correlation matrix (one cell fold,
    # natural-key self-join)
    "profile_correlation_matrix",
    # round 7 wave 2: effect sizes (Cohen's d / Hedges' g / rank-biserial)
    # for the md5-armed experiment — the magnitude companion to
    # stats_ttest_welch / agg_mannwhitney_u
    "stats_effect_sizes",
    # round 7 wave 2: binary-blob NEAR-dup via positional prefix-chunk
    # fingerprints through the (k, hash) band join — mm_content_dedup's
    # exact pass extended to mutation-tolerant signatures
    "mm_phash_band",
    # round 7 wave 2: the registered n_bits mitigation for the measured
    # fixed-bucket-width cliff (dedup_embed 107x at 10x -> 3.2x at 8 bits)
    "dedup_embed_pinned8",
    # round 7 wave 2: streamed spatial visits — session windows keyed by
    # (vehicle, cell), complete-mode ≡ batch window algebra (rule 13)
    "stream_geo_sessions",
    # round 7 wave 2: Efraimidis–Spirakis weighted bottom-k sampling —
    # fixed-K per stratum, weight-proportional, deterministic md5 draws,
    # measured ranking margin (rule 16 discipline)
    "sample_weighted",
    # round 7 wave 2: the multimodal curation FLAGSHIP — binaryFile lake
    # through exact dedup, chunk-band near-dup collapse, modality join,
    # and deterministic sharding, end to end on real files
    "corpus_multimodal_pipeline",
    # round 8: relative-error mergeable quantile sketch (DDSketch shape,
    # exact-integer bucket coding — binary-string length, never float log2)
    "agg_log_histogram_quantile",
    # round 8: training-data construction — DPO pair mining, power-of-two
    # batching capacities + pad-waste ledger, one-row release datasheet
    "corpus_preference_pairs", "corpus_length_buckets", "corpus_dataset_card",
    # round 8: entity resolution via deletion-neighborhood (SymSpell)
    # blocking — candidate volume linear in N, single-deletion error model
    "er_record_linkage",
    # round 8: md5-armed permutation test (K relabelings, one partial agg),
    # decile lift/gains, binary-segmentation changepoint, SAX symbolization
    "stats_permutation_test", "eval_lift_table", "ts_changepoint_binseg",
    "ts_sax",
    # round 8: directed HITS hubs/authorities over the similarity graph
    "graph_hits",
    # round 8: audio VAD front end — map-side framing + vectorized energy,
    # exact ASCII-sum twin around the stubbed decode
    "mm_audio_energy",
    # round 8: per-episode streaming funnel depth from session-window state
    "stream_funnel_sessions",
    # round 8 wave 3: bloom-filter point-lookup sink; streaming ER through
    # the static deletion-key index; the log sketch as streaming state
    "sink_parquet_bloom", "stream_dirty_linkage", "stream_log_histogram",
    # round 8 wave 4: DP mean with clamping (sum+count noised on half
    # budgets); the live experiment readout over per-user streaming state
    "privacy_dp_mean", "stream_ab_experiment",
    # round 8 wave 5: difficulty-ordered curriculum phases with token
    # budgets; Poisson rate-surprise anomaly (the count-side alert rule)
    "corpus_curriculum_order", "anomaly_rate_poisson",
    # round 8: the unbiased pass@k estimator as exact integer combinatorics
    "eval_pass_at_k",
    # round 8: BPE training as pure relational algebra (greedy leftmost
    # merge application via gaps-and-islands odd ranks)
    "text_bpe_train",
    # round 8: snapshot isolation via manifests (the table-format mechanism
    # from plain parquet: immutable data files + per-version manifests)
    "scan_snapshot_manifest",
    # round 8: the tokenized corpus (BPE rules applied, per-doc compression)
    "text_bpe_apply",
    # round 8: Newman modularity of a partition on the similarity graph
    "graph_modularity",
    # round 9 FLAGSHIP: content-defined chunking blob dedup (rsync/LBFS
    # family) — boundaries from a windowed hash predicate, so an insertion
    # re-chunks only the edit site; per-doc content-addressed storage ledger
    "mm_cdc_dedup",
    # round 9 FLAGSHIP: maximal repeated k-gram runs — the bounded relational
    # cut of suffix-array exact-substring dedup (Lee et al. ExactSubstr);
    # provable deletion superset of text_span_dedup at the same width
    "text_substring_dedup",
    # round 9: DP median via the exponential mechanism (Gumbel-max over a
    # public candidate lattice) — the quantile Laplace noise cannot deliver
    "privacy_dp_quantile",
    # round 9: incremental CDC ingest — per-doc upload ledger against a
    # growing content-addressed chunk store (the backup-generation shape)
    "mm_cdc_incremental",
    # round 9: per-language tokenizer fertility off the shared BPE rounds
    # memo — the multilingual vocabulary-equity report
    "corpus_bpe_fertility",
    # round 9: blocked approximate matrix profile — per-series top motif via
    # shape+octave candidate blocking, exact integer SSD
    "ts_motif_discovery",
    # round 9: the discord (anomaly) reading of the same memoized profile
    "anomaly_subsequence_discord",
    # round 9: the C4-style scrub consuming the repeated-run ledger —
    # overlap-aware union removal, first occurrence kept
    "corpus_substring_scrub",
    # round 9: streaming CDC ingest — window-free HOF chunking per arriving
    # blob, stateless probe of the static base chunk store
    "stream_cdc_ingest",
    # round 9: rolling OLS trend as four integer window sums (shift-invariant
    # x), and the pinball-loss quantile-forecast league table
    "win_regression_slope", "eval_pinball_loss",
    # round 9: benchmark-contamination guard at the ingest door — stateless
    # per-row gram probe of the static benchmark set, routing verdicts
    "stream_contamination_guard",
    # round 9: the blocking-quality gate for the ER family — pairs
    # completeness (recall) and collision precision off the pair ledger
    "eval_er_quality",
    # round 9: minimal-generalization repair for k-anonymity violations —
    # the monotone ladder as three aggs + a CASE, no iteration
    "privacy_generalize",
    # round 9: the write side of manifest snapshots — append + copy-on-write
    # delete commits, three versions audited through their manifests
    "sink_snapshot_commit",
    # round 9: CUPED variance reduction — exact second-moment sums, raw
    # stats as integer milli-units (rule 28), theta-laden floats 6dp
    "eval_ab_cuped",
    # round 9: link prediction (common-neighbor + Adamic-Adar) over the
    # similarity graph — non-adjacent wedge pairs, integer-evidence argmax
    "graph_link_prediction",
    # round 9: manifest file-stats pruning — whole files eliminated at the
    # planning phase before any footer read
    "scan_manifest_prune",
    # round 9: streaming deterministic reservoir (bottom-k as
    # applyInPandasWithState per-stratum state — an online-mergeable monoid)
    "stream_reservoir_sample",
    # round 9 wave 3: MDE power readout (exact second moments, rule-28
    # integer rationals); longest-streak gaps-and-islands; scene-cut
    # segmentation over the audio frame ledger (nested oracle); the
    # hour x weekday activity heat-map (the dayofweek offset trap, pinned)
    "eval_experiment_power", "seq_longest_streak", "mm_scene_cuts",
    "profile_activity_matrix",
    # round 9 wave 4: robust experiment means via exact histogram-boundary
    # order statistics; the release-to-release dataset diff table
    "eval_trimmed_mean", "corpus_dataset_diff",
    # round 9 wave 5 (queued for the r10 driver head): the seq-len packing
    # planner sweep; manifest-trio garbage collection (read/commit/GC)
    "corpus_seqlen_sweep", "sink_snapshot_gc",
    # round 9 wave 5: cross-blob containment from banded shared CDC chunks;
    # per-language bigram entropy rate (conditional Shannon estimate)
    "mm_cdc_containment", "text_entropy_rate",
    # round 10: CDC with production min/max chunk-size clamps (VERDICT r9
    # item 6 — MIN merge pass + MAX split pass, both content-local)
    "mm_cdc_clamped",
    # round 10 flagship: unigram-LM (SentencePiece) tokenizer training as
    # relational algebra — bounded-width Viterbi DP over the word histogram
    "text_unigram_train",
    # round 10: per-doc segmentation ledger riding the trained unigram chain
    "text_unigram_apply",
    # round 10: paired Wilcoxon signed-rank via support-histogram midranks
    "stats_wilcoxon_signrank",
    # round 10: always-valid sequential A/B monitoring (mSPRT running min)
    "eval_sequential_msprt",
    # round 10: delta-method inference for ratio metrics (user clustering)
    "eval_ratio_delta_ci",
    # round 10: live streaming mSPRT monitor (complete-mode moment cells)
    "stream_msprt_monitor",
    # round 10: seasonal-naive forecast backtest (MAE/MASE/sMAPE)
    "ts_forecast_backtest",
    # round 10: Kaplan-Meier survival with right censoring
    "stats_kaplan_meier",
    # round 10: seasonal ESD-style iterative max-deviate anomaly extraction
    "anomaly_seasonal_esd",
    # round 10: BPE-vs-unigram fertility bake-off riding both memos
    "corpus_tokenizer_compare",
    # round 10: in-engine logistic regression (quantized-weight GD)
    "ml_logreg_train",
    # round 10: off-policy IPS/SNIPS evaluation (all-integer estimator)
    "eval_counterfactual_ips",
    # round 10: difference-in-differences (quasi-experimental 2x2)
    "eval_diff_in_differences",
    # round 10: DeLong SE for AUC via support-histogram placements
    "eval_auc_delong",
    # round 10: streaming seasonal-naive forecast-residual monitor
    "stream_forecast_anomaly",
    # round 10: metadata-only snapshot rollback (manifest lifecycle complete)
    "sink_snapshot_rollback",
    # round 11: Bradley-Terry preference ranking (quantized-strength GD)
    "eval_bradley_terry",
    # round 11: naive-Bayes language identification (CCNet-shape gate)
    "text_lang_id",
    # round 11: streaming seasonal-ESD twin (shared extraction helper)
    "stream_seasonal_esd",
    # round 11: Spearman rank correlation via support-histogram midranks
    "stats_spearman",
    # round 11: ARI/LIX readability indices (all-integer ppm)
    "text_readability",
    # round 11: Murphy decomposition of the Brier score (calibration audit)
    "eval_brier_decomposition",
    # round 11: integer-period Schuster periodogram (frequency-domain lens)
    "ts_periodogram",
    # round 11: streaming language-mix drift monitor (lang-id model consumer)
    "stream_lang_drift",
    # round 11: Friedman blocked rank test (per-block support midranks)
    "stats_friedman",
    # round 11: isotonic calibration via the minimax PAV identity
    "eval_isotonic_calibration",
    # round 11: snapshot time travel (version / timestamp resolution)
    "scan_snapshot_timetravel",
    # round 11: entropy + recursive (c,l)-diversity audits
    "privacy_entropy_ldiv",
    # round 11: exact cumulative-distinct growth (first-touch decomposition)
    "agg_distinct_growth",
    # round 11: two-proportion z-test (pooled + continuity-corrected)
    "stats_proportion_ztest",
    # round 11: CCNet-shape quality classifier (rule-29 GD, consumer #2)
    "corpus_quality_classifier",
    # round 11: streaming first-touch audience-growth twin
    "stream_distinct_growth",
    # round 11: Laspeyres price-volume-mix revenue decomposition
    "composite_price_volume_mix",
    # round 11: BT-reward-weighted training-mix planner (memoized BT fit)
    "corpus_reward_mix",
    # round 11: per-brand Pareto-frontier skyline (range-frame window)
    "win_skyline_pareto",
    # round 11: Kneser-Ney smoothed bigram LM (continuation counts)
    "text_kneser_ney",
    # round 11: time-constrained funnel (windowFunnel semantics)
    "seq_window_funnel",
    # round 11: Cohen's kappa over the lang-id confusion (model consumer #3)
    "eval_langid_kappa",
    # round 11: Theil-Sen robust trend vs OLS per channel
    "ts_theil_sen",
    # round 11: classifier-guided rejection filtering (memoized QC weights)
    "corpus_classifier_filter",
    # round 11: Dickey-Fuller unit-root stationarity gate per channel
    "ts_unit_root_df",
    # round 11: Bartlett variance-homogeneity test (levene's parametric kin)
    "stats_bartlett",
    # round 11: Matthews correlation at the QC decision boundary
    "eval_mcc",
    # round 11: Holt-Winters additive seasonal smoothing (7-slot state)
    "ts_holt_winters",
    # round 11: Heaps'-law vocabulary-growth curve + hapax ledger
    "text_heaps_law",
    # round 11: Cochran's Q (k blocked binary treatments)
    "stats_cochran_q",
    # round 11: TOST equivalence / non-inferiority readout
    "eval_tost_equivalence",
    # round 11: exponentially-decayed leaderboard (exact power-of-two decay)
    "stream_decayed_topk",
    # round 12: 2-component Gaussian-mixture EM (quantized unsupervised fit)
    "ml_gmm_quality",
    # round 12: posterior-weighted deterministic corpus sampler (GMM consumer)
    "corpus_gmm_posterior_sample",
    # round 12: quota/best-of-n curated-corpus selector (BT+QC+lang-id memos)
    "corpus_curated_select",
    # round 12: Kendall tau-b via joint-support dominance sums
    "stats_kendall_tau",
    # round 12: Mann-Kendall trend test (ts_theil_sen's hypothesis partner)
    "ts_mann_kendall",
    # round 12: k=1 vs k=2 BIC mixture-order selection (exact moments)
    "ml_gmm_bic",
    # round 12: streaming GMM posterior gate (batch-equal ledger)
    "stream_gmm_quality_gate",
    # round 12: Cox proportional hazards (Breslow risk-set suffix algebra)
    "ml_cox_ph",
    # round 12: both-direction lag-1 Granger F-screen (exact moment fold)
    "ts_granger_lag1",
    # round 12: Church-Gale term burstiness (templated-text VMR)
    "text_burstiness",
    # round 12: G-test + Cramér's V on the segment x priority table
    "stats_g_test",
    # round 12: rescaled-range Hurst exponent (exact block deviations)
    "ts_hurst_rs",
    # round 12: BM25 top-k retrieval (quantized postings, integer ranks)
    "text_bm25_topk",
    # round 12: lexical+dense reciprocal-rank fusion (integer RRF)
    "sim_hybrid_rrf",
    # round 12: running-peak max drawdown per channel (all-integer)
    "win_drawdown",
    # round 12: hybrid-retrieval ablation (precision@k, three searchers)
    "eval_hybrid_gain",
    # round 12: streaming drawdown twin (shared extraction helper)
    "stream_drawdown_monitor",
    # round 12: Spiegelhalter calibration Z (128-bit exact sums)
    "eval_calibration_spiegelhalter",
    # round 12: multi-epoch BT-mix -> uniform anneal (integer interpolation)
    "corpus_mix_anneal",
    # round 12: closed-form ridge regression (one moment fold + Cramer solve)
    "ml_ridge_regression",
    # round 12: personalized PageRank from a seed set (restart walk)
    "graph_ppr",
    # round 12: streaming closed-form ridge (associative moment state)
    "stream_ridge_online",
]

# Ops whose semantics genuinely cannot be expressed as a deterministic DuckDB
# twin; everything else MUST carry an oracle.
EXPECTED_ROWS_ONLY = {
    "sample_frac",          # Spark's Bernoulli sampler ≠ DuckDB's
    "agg_approx_distinct",  # HLL estimate
    "dedup_near",           # seeded xxhash64 minhash
    "stream_late_data",     # watermark drop semantics have no batch twin
    "dedup_simhash",        # seeded xxhash64 signature
    "agg_sketch_rollup",    # Datasketches HLL binary ≠ DuckDB's approx HLL
}


def test_survey_inventory_fully_covered():
    missing = [q for q in SURVEY_S2_INVENTORY if q not in REGISTRY]
    assert not missing, f"SURVEY §2 operators not registered: {missing}"
    assert len(SURVEY_S2_INVENTORY) == 101


def test_extensions_registered():
    missing = [q for q in EXTENSIONS if q not in REGISTRY]
    assert not missing, missing


def test_oracle_discipline():
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only == EXPECTED_ROWS_ONLY, (
        f"unexpected rows-only: {rows_only - EXPECTED_ROWS_ONLY}; "
        f"lost rows-only: {EXPECTED_ROWS_ONLY - rows_only}"
    )


def test_no_unregistered_strays():
    known = set(SURVEY_S2_INVENTORY) | set(EXTENSIONS)
    strays = [n for n in REGISTRY if n not in known]
    assert not strays, f"registered but undocumented: {strays}"


def test_oracle_dialect_lint():
    """Static lint over every oracle's SQL for the dialect traps in PARITY.md
    — catches regressions without running DuckDB."""
    import re

    # Coarse by design: nested parens and casts placed after OVER(...) defeat
    # exact matching, and the executed parity suite is the real gate — this
    # only catches WHOLESALE omissions of a required cast within an oracle.
    problems = []
    for name, spec in REGISTRY.items():
        sql = spec.oracle
        if sql is None:
            continue
        if "epoch(" in sql and "::BIGINT" not in sql:
            problems.append((name, "epoch() used but no ::BIGINT cast anywhere"))
        if re.search(r"sum\((n_\w+|gap_flag|new_flag)\b", sql) and "::BIGINT" not in sql:
            problems.append((name, "integer sum but no ::BIGINT cast anywhere"))
        # rand() is forbidden everywhere (determinism)
        if re.search(r"\brand(om)?\s*\(", sql):
            problems.append((name, "rand() in oracle"))
    assert not problems, problems
