package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: writes PLANS.md — AQE-final formatted physical plans for
  * the flagship queries, as reviewable evidence of scan pruning,
  * pushdown, join strategy and codegen coverage.
  * Usage: runMain graft.tools.PlanDump [sfDir]
  */
object PlanDump {
  private val flagship = Seq(
    "q_join_multiway", "q_agg_hash", "q_topk", "q_scan_pruned",
    "q_win_topk_group", "q_dedup_near", "q_minhash_lsh", "q_sim_expr",
    "q_tumbling_batch", "q_join_theta", "q_join_range", "q_skew_agg",
    "q_doc_chunk", "q_decontam", "q_tfidf", "q_sample_stratified",
    "q_join_nullsafe", "q_centroid",
    "q_funnel", "q_anomaly", "q_hist", "q_bloom_decontam", "q_quantize_embed",
    "q_event_path", "q_corpus_yield", "q_ngram_freq", "q_text_stats",
    "q_bm25", "q_hybrid_rrf", "q_pack_sequences", "q_chunk_cdc",
    "q_mix_weights", "q_source_overlap",
    "q_join_bucketed", "q_join_range_native", "q_zorder",
    "q_inverted_index", "q_cooccur_lift", "q_group_sample",
    "q_filter_interval", "q_activity_islands", "q_event_transitions",
    "q_ohlc", "q_token_diversity", "q_label_affinity", "q_rfm",
    "q_rle_zorder", "q_boxplot", "q_profile", "q_day_over_day",
    "q_merge_upsert", "q_scd2", "q_ivm_refresh", "q_trend_fit",
    "q_abtest", "q_mutual_info", "q_gini", "q_rolling_median",
    "q_pagerank", "q_graph_butterflies", "q_sample_weighted",
    "q_decay_score", "q_char_entropy", "q_winsorize",
    "q_graph_jaccard", "q_holt_linear", "q_decompose",
    "q_attribution", "q_dedup_containment", "q_grouped_regression",
    "q_graph_components", "q_graph_bfs", "q_pca_power",
    "q_markov_stationary", "q_skyline", "q_kendall_tau",
    "q_bootstrap_ci", "q_graph_kcore", "q_graph_clustering",
    "q_stickiness", "q_changepoint", "q_theil_sen", "q_centroid_shift",
    "q_wilson_lb", "q_churn", "q_elasticity",
    // round-12 diagnostics: the window-df rewrite, the broadcast-grid
    // JS drift, the shared lag frame, and the probe-bounded calibration
    "q_cross_doc_ngram", "q_js_divergence", "q_ljung_box", "q_hurst",
    "q_minhash_est_err", "q_audience_overlap", "q_length_profile",
    // round-14 additions worth reading: the shared cents-grid family,
    // the integer HITS iteration, the one-shuffle filter cascade, and
    // the two-list capture-recapture overlap
    "q_ks_test", "q_wasserstein_1d", "q_energy_dist", "q_hits",
    "q_filter_cascade", "q_capture_recapture", "q_compaction_plan",
    "q_periodogram", "q_trimmed_mean", "q_vocab_coverage",
    // round-15 additions worth reading: the band-offset abc rewrite,
    // the TopKAgg-shaped ranking metrics, the AUC face of the cents
    // grid, the audit trio's keyed probes, the trigram-LM bucketing
    // and the covariance-spectrum expansion
    "q_abc_class", "q_ndcg", "q_auc_roc", "q_ri_audit",
    "q_fd_violations", "q_ppl_bucket", "q_embed_dim", "q_qini",
    "q_blocking_quality", "q_matrix_profile", "q_burst_detect",
    "q_textrank", "q_keyphrase", "q_token_novelty",
    // round-15 extension batch worth reading: the hub-capped wedge
    // expansion, the two new cents-grid rank tests, the shared
    // periodogram frame, and the bigram-entropy margin joins
    "q_graph_ra", "q_ansari_bradley", "q_brunner_munzel",
    "q_spectral_entropy", "q_word_entropy", "q_key_candidates",
    "q_chao1", "q_distinct_ngrams",
    // round-16 flagships: the DP/iterative and attribution shapes
    "q_dtw", "q_macd", "q_sigma_clip", "q_backtest_naive",
    "q_shapley_attribution", "q_markov_attribution", "q_fdr_bh",
    "q_isotonic", "q_kmeans_1d", "q_gmm_em", "q_logistic_1d",
    "q_dedup_verify", "q_bleu_pairs", "q_fellegi_sunter",
    "q_kn_logprob", "q_graph_closeness", "q_label_propagation",
    "q_t_closeness", "q_xyz_class", "q_ols2", "q_weibull_fit",
    // round-17 flagships: the in-row trigram rewrite is read under
    // q_ppl_bucket above; here the decorrelated LATERAL, the audio
    // decode rollups, the sq8 broadcast-quantize pass, the rich-club
    // degree joins, and the three new dailyGrid screens
    "q_join_lateral", "q_audio_features", "q_audio_silence",
    "q_sq8_recall", "q_graph_rich_club", "q_word_len_hist",
    "q_punct_profile", "q_cox_stuart", "q_bartels_rank", "q_pinball",
    // round-18 flagships: the PQ codebook/assignment broadcasts and
    // the GIF87a per-partition decode rollup, plus q_ppl_bucket's
    // row-guarded LM broadcast and the unhinted supplier/customer
    // chains (all re-read above under their own names)
    "q_pq_recall", "q_video_frames")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — AQE-final physical plans of flagship queries\n\n")
    sb.append(s"Generated by `graft.tools.PlanDump` on `$sfDir`. Things to see:\n")
    sb.append("`PushedFilters`/`ReadSchema` pruning on every scan, broadcast vs\n")
    sb.append("sort-merge choices, `WholeStageCodegen` spans, and the absence of\n")
    sb.append("cartesian products.\n")
    flagship.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${flagship.size} queries)")
    spark.stop()
  }
}
