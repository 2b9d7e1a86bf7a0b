package graft

/** Per-query clean-run bench floors (seconds, sf0.1, local[32]) —
  * min-merged at r12 across the committed table (incl. the q_knn_lsh
  * warm re-harvest and the q_cross_doc_ngram window-df rewrite) and
  * fresh quiet-box runs at HEAD 6a76b0d (last run total 111.862 s over
  * 237 queries — the full round-12 surface).
  * Bench second-pass-retries any query whose best-of-2 exceeds 2.5x its
  * floor: the driver box's contention inflates sub-2 s queries by 3-4x
  * in bursts the absolute threshold cannot see (BENCH_r08's agg_*
  * cluster). Floors are a retry TRIGGER, never a reported number — a
  * genuinely regressed query still records its real (slow) time after
  * the retry confirms it. Regenerate after adding queries or real
  * performance changes: tools/gen_floors.py (see its docstring),
  * min-merging against the committed table.
  */
object BenchFloors {
  val floor: Map[String, Double] = Map(
    "q_abc_class" -> 0.438,
    "q_abtest" -> 0.092,
    "q_acf" -> 0.452,
    "q_activity_islands" -> 0.187,
    "q_adf" -> 0.244, // r13 TimeQuery warm-min harvest
    "q_agg_approx_distinct" -> 0.169,
    "q_agg_approx_pct" -> 0.164,
    "q_agg_approx_topk" -> 0.176,
    "q_agg_collect" -> 0.167,
    "q_agg_cube" -> 0.155,
    "q_agg_distinct" -> 0.164,
    "q_agg_filtered" -> 0.151,
    "q_agg_gsets" -> 0.154,
    "q_agg_hash" -> 0.213,
    "q_agg_having" -> 0.173,
    "q_agg_rollup" -> 0.177,
    "q_agg_stats" -> 0.149,
    "q_agg_weighted" -> 0.169,
    "q_anderson_darling" -> 0.115, // r14 TimeQuery warm-min harvest
    "q_anomaly" -> 0.248,
    "q_anova" -> 0.087,
    "q_ar1" -> 0.212,
    "q_array" -> 0.081,
    "q_assoc_rules" -> 1.351,
    "q_attribution" -> 0.408,
    "q_auc_roc" -> 0.09, // r15 TimeQuery warm-min harvest
    "q_audience_overlap" -> 0.268,
    "q_bartlett" -> 0.152, // r14 TimeQuery warm-min harvest
    "q_basket_size_dist" -> 0.297, // r12 TimeQuery warm-min harvest
    "q_benford" -> 0.186,
    "q_bigram_logprob" -> 1.002,
    "q_blocking_quality" -> 1.697, // r15 TimeQuery warm-min harvest
    "q_bloom_decontam" -> 1.049,
    "q_bm25" -> 0.47,
    "q_bollinger" -> 0.133,
    "q_bootstrap_ci" -> 0.146,
    "q_boxplot" -> 0.346,
    "q_brier" -> 0.213, // r15 TimeQuery warm-min harvest
    "q_brown_forsythe" -> 0.128,
    "q_burst_detect" -> 0.156, // r15 TimeQuery warm-min harvest
    "q_burstiness" -> 0.262,
    "q_calibration" -> 0.167, // r15 TimeQuery warm-min harvest
    "q_capture_recapture" -> 1.8, // r14 TimeQuery warm-min harvest
    "q_case_cast" -> 0.065,
    "q_cat_entropy" -> 0.159,
    "q_centroid" -> 0.107,
    "q_centroid_shift" -> 0.246,
    "q_changepoint" -> 0.18,
    "q_char_entropy" -> 0.096,
    "q_chisq_trend" -> 0.056, // r14 TimeQuery warm-min harvest
    "q_chow" -> 0.241, // r14 TimeQuery warm-min harvest
    "q_chunk_cdc" -> 0.33,
    "q_churn" -> 0.26,
    "q_cliffs_delta" -> 0.08, // r14 TimeQuery warm-min harvest
    "q_cochran_q" -> 0.157, // r14 TimeQuery warm-min harvest
    "q_cohens_d" -> 0.095,
    "q_cohens_kappa" -> 0.359, // r14 TimeQuery warm-min harvest
    "q_cohort_ltv" -> 0.189,
    "q_compaction_plan" -> 0.13, // r14 TimeQuery warm-min harvest
    "q_completeness" -> 0.194, // r15 TimeQuery warm-min harvest
    "q_confusion_matrix" -> 0.081, // r15 TimeQuery warm-min harvest
    "q_context_fit" -> 0.102,
    "q_cooccur_lift" -> 0.417,
    "q_cooks_distance" -> 0.21, // r13 TimeQuery warm-min harvest
    "q_corpus_pipeline" -> 0.271,
    "q_corpus_yield" -> 0.165,
    "q_corr_matrix" -> 0.167,
    "q_countmin_err" -> 0.232, // r14 TimeQuery warm-min harvest
    "q_cramer_von_mises" -> 0.085, // r14 TimeQuery warm-min harvest
    "q_cramers_v" -> 0.084,
    "q_cross_doc_ngram" -> 0.397,
    "q_cuped" -> 0.081,
    "q_cusum" -> 0.145,
    "q_dataset_card" -> 0.306, // r14 TimeQuery warm-min harvest
    "q_date" -> 0.064,
    "q_day_over_day" -> 0.132,
    "q_decay_score" -> 0.092,
    "q_decompose" -> 0.122,
    "q_decontam" -> 0.603,
    "q_dedup_containment" -> 0.998,
    "q_dedup_embed" -> 0.328,
    "q_dedup_exact" -> 0.106,
    "q_dedup_fuzzy" -> 0.259,
    "q_dedup_incremental" -> 0.143, // r14 TimeQuery warm-min harvest
    "q_dedup_keepers" -> 1.538, // r14 close min-merge (bench_r14g)
    "q_dedup_latest" -> 0.174,
    "q_dedup_near" -> 1.001,
    "q_dedup_roi" -> 0.178,
    "q_dedup_simhash" -> 1.187,
    "q_dedup_threshold_curve" -> 0.169,
    "q_distinct_rollup" -> 0.12,
    "q_diurnal" -> 0.118,
    "q_doc_chunk" -> 0.072,
    "q_doc_novelty" -> 0.398, // r14 close min-merge (bench_r14g)
    "q_dormancy" -> 0.128, // r12 TimeQuery warm-min harvest
    "q_drawdown" -> 0.177,
    "q_drift_tvd" -> 0.215,
    "q_dunn" -> 0.409, // r14 close min-merge (bench_r14g)
    "q_dup_cluster_sizes" -> 1.643,
    "q_dup_clusters" -> 1.435,
    "q_durbin_watson" -> 0.164, // r14 close min-merge (bench_r14g)
    "q_elasticity" -> 0.115,
    "q_embed_dim" -> 1.843, // r15 TimeQuery warm-min harvest
    "q_embed_norms" -> 0.101, // r12 TimeQuery warm-min harvest
    "q_embed_outliers" -> 0.206, // r13 first harvest
    "q_energy_dist" -> 0.085, // r14 close min-merge (bench_r14g)
    "q_entropy_rate" -> 0.388,
    "q_event_path" -> 0.273,
    "q_event_transitions" -> 0.253,
    "q_ewma" -> 0.129,
    "q_except" -> 0.157,
    "q_except_all" -> 0.168,
    "q_exists_subquery" -> 0.205,
    "q_exp_health" -> 0.076,
    "q_fd_violations" -> 0.088, // r15 TimeQuery warm-min harvest
    "q_filter_cascade" -> 0.376, // r14 TimeQuery warm-min harvest
    "q_filter_interval" -> 0.082,
    "q_filter_null" -> 0.073,
    "q_filter_pred" -> 0.074,
    "q_friedman" -> 0.188, // r14 close min-merge (bench_r14g)
    "q_funnel" -> 0.297,
    "q_funnel_time" -> 0.236,
    "q_gap_hist" -> 0.213, // r15 TimeQuery warm-min harvest
    "q_gapfill" -> 0.127,
    "q_gini" -> 0.106,
    "q_granger" -> 0.19, // r14 close min-merge (bench_r14g)
    "q_graph_assortativity" -> 1.071, // r14 close min-merge (bench_r14g)
    "q_graph_bfs" -> 2.155,
    "q_graph_butterflies" -> 1.555, // r14 close min-merge (bench_r14g)
    "q_graph_clustering" -> 1.222,
    "q_graph_components" -> 2.528,
    "q_graph_degree" -> 1.085,
    "q_graph_jaccard" -> 0.981,
    "q_graph_kcore" -> 1.627,
    "q_graph_modularity" -> 1.063, // r14 close min-merge (bench_r14g)
    "q_graph_triangles" -> 1.058,
    "q_group_sample" -> 0.125,
    "q_grouped_regression" -> 0.211,
    "q_grubbs" -> 0.15, // r13 first harvest
    "q_gumbel_maxima" -> 0.095, // r14 close min-merge (bench_r14g)
    "q_heaps_fit" -> 0.15, // r14 close min-merge (bench_r14g)
    "q_hellinger" -> 0.066, // r14 close min-merge (bench_r14g)
    "q_hhi" -> 0.162,
    "q_hill_tail" -> 0.18, // r12 TimeQuery warm-min harvest
    "q_hist" -> 0.107,
    "q_hits" -> 1.019, // r14 TimeQuery warm-min harvest
    "q_hodges_lehmann" -> 0.25, // r14 close min-merge (bench_r14g)
    "q_holt_linear" -> 0.123,
    "q_holt_winters" -> 0.113, // r15 TimeQuery warm-min harvest
    "q_hurst" -> 0.254,
    "q_hybrid_rrf" -> 0.492,
    "q_image_phash" -> 0.508,
    "q_image_resize" -> 0.349, // r14 TimeQuery warm-min harvest
    "q_interpurchase" -> 0.656,
    "q_intersect" -> 0.13,
    "q_intersect_all" -> 0.15, // r14 close min-merge (bench_r14g)
    "q_inverted_index" -> 0.582,
    "q_item_cosine" -> 1.012,
    "q_ivm_refresh" -> 0.119,
    "q_jarque_bera" -> 0.096,
    "q_jonckheere" -> 0.556, // r14 close min-merge (bench_r14g)
    "q_join_anti" -> 0.121,
    "q_join_asof" -> 0.066,
    "q_join_bhj" -> 0.234,
    "q_join_bucketed" -> 0.167,
    "q_join_full" -> 0.127,
    "q_join_left" -> 0.09,
    "q_join_multiway" -> 0.261,
    "q_join_nullsafe" -> 0.126,
    "q_join_range" -> 0.239,
    "q_join_range_native" -> 0.223,
    "q_join_semi" -> 0.144,
    "q_join_smj" -> 0.34,
    "q_join_theta" -> 0.224,
    "q_js_divergence" -> 0.228,
    "q_kaplan_meier" -> 0.138,
    "q_kendall_tau" -> 1.018,
    "q_kendall_w" -> 0.217, // r15 TimeQuery warm-min harvest
    "q_keyphrase" -> 0.595, // r15 TimeQuery warm-min harvest
    "q_knn_ivf" -> 2.37, // r14 close min-merge (bench_r14g)
    "q_knn_lsh" -> 0.669, // r14 close min-merge (bench_r14g)
    "q_knn_recall_curve" -> 0.247, // r14 close min-merge (bench_r14g)
    "q_knn_reciprocity" -> 0.529, // r14 close min-merge (bench_r14g)
    "q_kpss" -> 0.165, // r14 close min-merge (bench_r14g)
    "q_ks_test" -> 0.178,
    "q_kruskal_wallis" -> 0.223, // r14 TimeQuery warm-min harvest
    "q_label_affinity" -> 0.172,
    "q_lang_confusion" -> 0.243, // r12 TimeQuery warm-min harvest
    "q_lang_id" -> 0.063,
    "q_length_profile" -> 0.088,
    "q_lift_curve" -> 0.288, // r13 TimeQuery warm-min harvest
    "q_ljung_box" -> 0.213,
    "q_lm_dirichlet" -> 0.334, // r15 TimeQuery warm-min harvest
    "q_log_rank" -> 0.215, // r14 TimeQuery warm-min harvest
    "q_lorenz" -> 0.31,
    "q_lsh_tuning" -> 2.226, // r14 close min-merge (bench_r14g)
    "q_mad_outliers" -> 0.385,
    "q_mann_kendall" -> 0.206, // r14 extension harvest
    "q_mann_whitney" -> 0.076,
    "q_map_json" -> 0.052,
    "q_markov_stationary" -> 0.332,
    "q_mase" -> 0.107, // r14 TimeQuery warm-min harvest
    "q_math" -> 0.074,
    "q_matrix_profile" -> 0.188, // r15 TimeQuery warm-min harvest
    "q_mcnemar" -> 0.097, // r14 TimeQuery warm-min harvest
    "q_merge_upsert" -> 0.256,
    "q_minhash_est_err" -> 1.086, // r12 probe-bounded truth side (array_intersect, no uncapped pair join)
    "q_minhash_lsh" -> 0.956,
    "q_mix_weights" -> 0.091,
    "q_moods_median" -> 0.125, // r14 extension harvest (sorted-array median form)
    "q_mrr" -> 0.327, // r15 TimeQuery warm-min harvest
    "q_multimodal" -> 0.102,
    "q_multimodal_decode" -> 0.323,
    "q_multimodal_frames" -> 0.709,
    "q_mutual_info" -> 0.136,
    "q_ndcg" -> 0.391, // r15 TimeQuery warm-min harvest
    "q_nelson_aalen" -> 0.144, // r14 TimeQuery warm-min harvest
    "q_nemenyi" -> 0.261, // r14 TimeQuery warm-min harvest
    "q_new_returning" -> 0.124, // r12 TimeQuery warm-min harvest
    "q_ngram_freq" -> 0.422,
    "q_odds_ratio" -> 0.1, // r13 TimeQuery warm-min harvest
    "q_ohlc" -> 0.135,
    "q_pacf" -> 0.157,
    "q_pack_sequences" -> 0.052,
    "q_page_hinkley" -> 0.149, // r13 first harvest
    "q_page_trend" -> 0.223, // r14 TimeQuery warm-min harvest
    "q_pagerank" -> 2.218, // r14 close min-merge (bench_r14g)
    "q_paired_t" -> 0.264, // r14 TimeQuery warm-min harvest
    "q_partial_corr" -> 0.122,
    "q_pca_power" -> 0.103,
    "q_peak_detection" -> 0.143,
    "q_periodogram" -> 0.287, // r14 TimeQuery warm-min harvest
    "q_pettitt" -> 0.156, // r14 extension harvest (TimeQuery warm-min, sf0.1)
    "q_pivot" -> 0.087,
    "q_poisson_dispersion" -> 0.087, // r13 first harvest
    "q_power_analysis" -> 0.062, // r14 TimeQuery warm-min harvest
    "q_ppl_bucket" -> 3.186, // r15 TimeQuery warm-min harvest
    "q_pr_auc" -> 0.059, // r15 TimeQuery warm-min harvest
    "q_precision_at_k" -> 0.405, // r15 TimeQuery warm-min harvest
    "q_prefix_dup" -> 0.209, // r13 first harvest
    "q_price_index" -> 0.438, // r13 TimeQuery warm-min harvest
    "q_profile" -> 1.452,
    "q_profile_approx" -> 1.666,
    "q_project" -> 0.05,
    "q_psi" -> 0.108,
    "q_qini" -> 0.243, // r15 TimeQuery warm-min harvest
    "q_quality_score" -> 0.079,
    "q_quantile_skew" -> 0.075, // r14 TimeQuery warm-min harvest
    "q_quantize_embed" -> 0.082,
    "q_repetition" -> 0.335,
    "q_retention" -> 0.211,
    "q_revenue_bridge" -> 0.192, // r13 TimeQuery warm-min harvest
    "q_rfm" -> 0.085,
    "q_ri_audit" -> 0.092, // r15 TimeQuery warm-min harvest
    "q_rle_zorder" -> 0.111,
    "q_rolling_corr" -> 0.271, // r13 TimeQuery warm-min harvest
    "q_rolling_median" -> 0.05,
    "q_rsi" -> 0.163,
    "q_runs_test" -> 0.141, // r13 first harvest
    "q_sample_split" -> 0.05,
    "q_sample_stratified" -> 0.172,
    "q_sample_weighted" -> 0.112,
    "q_sax_motifs" -> 0.189,
    "q_scalar_subquery" -> 0.1,
    "q_scan_parquet" -> 0.05,
    "q_scan_pruned" -> 0.06,
    "q_scd2" -> 0.221,
    "q_seasonal_anomaly" -> 0.188, // r14 TimeQuery warm-min harvest
    "q_seasonal_mk" -> 0.215, // r14 extension harvest (TimeQuery warm-min, sf0.1)
    "q_seasonal_strength" -> 0.163,
    "q_seasonality" -> 0.108,
    "q_session_batch" -> 0.303,
    "q_sessionize" -> 0.055,
    "q_shard_skew" -> 0.086, // r14 TimeQuery warm-min harvest
    "q_shingle_df_profile" -> 0.61, // r12 TimeQuery warm-min harvest
    "q_ship_lag" -> 0.303, // r12 TimeQuery warm-min harvest
    "q_silhouette" -> 0.238, // r13 TimeQuery warm-min harvest
    "q_sim_brute" -> 0.301,
    "q_sim_expr" -> 0.152,
    "q_simpson_diversity" -> 0.149,
    "q_sketch_rollup" -> 0.184,
    "q_skew_agg" -> 0.083,
    "q_skew_join" -> 0.133,
    "q_skyline" -> 0.401,
    "q_sliding_batch" -> 0.189,
    "q_sort_multi" -> 0.05,
    "q_source_dsv2" -> 0.07,
    "q_source_dup_matrix" -> 1.123, // r12 TimeQuery warm-min harvest
    "q_source_overlap" -> 1.563, // r14 close min-merge (bench_r14g)
    "q_source_xent" -> 0.394, // r14 TimeQuery warm-min harvest
    "q_spearman" -> 0.216,
    "q_split_leakage" -> 0.222, // r14 TimeQuery warm-min harvest
    "q_sprt" -> 0.073, // r14 TimeQuery warm-min harvest
    "q_srm" -> 0.05, // r15 TimeQuery warm-min harvest
    "q_stickiness" -> 0.25,
    "q_stopword_profile" -> 0.113,
    "q_str" -> 0.05,
    "q_tail_exact" -> 0.094,
    "q_target_encode" -> 0.162, // r14 TimeQuery warm-min harvest
    "q_text_fingerprint" -> 0.409,
    "q_text_pii" -> 0.05,
    "q_text_stats" -> 0.171,
    "q_textrank" -> 1.469, // r15 TimeQuery warm-min harvest
    "q_tfidf" -> 0.631,
    "q_theil" -> 0.159,
    "q_theil_sen" -> 0.21,
    "q_time_weighted" -> 0.221,
    "q_token_budget_trim" -> 0.252, // r14 TimeQuery warm-min harvest
    "q_token_count" -> 0.082,
    "q_token_diversity" -> 0.056,
    "q_token_len_hist" -> 0.127,
    "q_token_novelty" -> 0.245, // r15 TimeQuery warm-min harvest
    "q_topk" -> 0.149,
    "q_topk_agg" -> 0.315,
    "q_trend_fit" -> 0.088,
    "q_trimmed_mean" -> 0.073, // r14 TimeQuery warm-min harvest
    "q_tukey_hsd" -> 0.137, // r14 extension harvest
    "q_tumbling_batch" -> 0.152,
    "q_turning_points" -> 0.112, // r13 first harvest
    "q_unigram_logprob" -> 0.385,
    "q_union_all" -> 0.067,
    "q_union_byname" -> 0.061,
    "q_union_distinct" -> 0.112,
    "q_unpivot" -> 0.078,
    "q_variance_ratio" -> 0.101, // r13 TimeQuery warm-min harvest
    "q_vocab_coverage" -> 0.145, // r14 post-rewrite harvest (TopKStrAgg single-pass form)
    "q_wasserstein_1d" -> 0.071, // r14 TimeQuery warm-min harvest
    "q_weighted_median" -> 0.939,
    "q_welch_t" -> 0.068,
    "q_wilcoxon_signed" -> 0.275, // r14 TimeQuery warm-min harvest
    "q_wilson_lb" -> 0.236,
    "q_win_distinct" -> 0.052,
    "q_win_distinct_hll" -> 0.053,
    "q_win_lag" -> 0.05,
    "q_win_moving" -> 0.157,
    "q_win_ntile_firstlast" -> 0.05,
    "q_win_pctrank" -> 0.05,
    "q_win_range" -> 0.05,
    "q_win_rank" -> 0.05,
    "q_win_running" -> 0.05,
    "q_win_topk_group" -> 0.381,
    "q_window_funnel" -> 0.252, // r12 TimeQuery warm-min harvest
    "q_winsorize" -> 0.175,
    "q_woe_iv" -> 0.232, // r15 TimeQuery warm-min harvest
    "q_xcorr" -> 0.174,
    "q_zipf_fit" -> 0.113,
    "q_zorder" -> 0.101,
  )
}
