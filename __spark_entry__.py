"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``nfl26_bigdatabowl_prediction_spark``;
this module only wires the registry into the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nfl26_bigdatabowl_prediction_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the multi-aggregate pricing summary
    (SURVEY.md §2.4 A2 — the reference's 14-named-agg groupBy,
    main_cuda.py:365-380) over sf0.001."""
    return QUERIES["q_groupby_multi"](spark, "/root/testdata/sf0.001")


# Names with a fully-green driver row (hash_match) in a PRIOR round's
# CORRECTNESS_r{N}.json.  The driver verifies the first 50 entries of
# queries() in insertion order, so each round we front-load the
# queries that do not yet have a green driver row and push the
# already-verified ones to the back — rotating until every query has
# driver-level evidence.  Update this set from CORRECTNESS_r{N}.json
# at the start of each round.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # round 1 (CORRECTNESS_r01.json, 46 value-green)
    "q_groupby_multi", "q_scan_parquet", "q_scan_csv", "q_project",
    "q_filter_range", "q_filter_finite", "q_fill", "q_dropna", "q_clip",
    "q_cast", "q_dummy_encode", "q_str_parse", "q_concat_id", "q_distinct",
    "q_union_all", "q_intersect", "q_sort", "q_topn_global",
    "q_join_inner", "q_join_left", "q_semi", "q_anti", "q_rmse", "q_rollup",
    "q_distinct_agg", "q_cube", "q_grouping_sets", "q_salted_join",
    "q_salted_distinct", "q_star_join", "q_quantile", "q_scan_orc",
    "q_scan_json", "q_unpivot", "q_lag", "q_lead", "q_rolling", "q_diff",
    "q_diff2", "q_cumsum", "q_cumcount", "q_norm_by_max", "q_last_n",
    "q_topk_per_group", "q_rank_fns",
    # round 2 (CORRECTNESS_r02.json, 50/50 fully green)
    "q_except", "q_pivot", "q_hypertable_rollup", "q_join_full", "q_mode",
    "q_map_ops", "q_sketch_bounds", "q_scan_partitioned", "q_merge_upsert",
    "q_sql_text", "q_bucketed_join", "q_group_corr", "q_date_parts",
    "q_scan_xml", "q_python_datasource", "q_ship_priority", "q_promo_share",
    "q_unshipped_revenue", "q_big_spenders", "q_trade_volume",
    "q_fuzzy_join", "q_dpp_join", "q_revenue_by_nation",
    "q_returned_customers", "q_top_supplier", "q_ohlc", "q_data_profile",
    "q_skyline", "q_bitmap_distinct", "q_decimal_agg", "q_interval_arith",
    "q_schema_evolution", "q_pivot_multi", "q_dq_rules",
    "q_shuffle_hash_join", "q_equi_depth_hist", "q_last_per_group", "q_ewm",
    "q_transform_sum", "q_team_stats", "q_softmax_group", "q_cond_agg",
    "q_group_mean_impute", "q_circular_mean", "q_argmin", "q_collect_traj",
    "q_json", "q_sessionize", "q_ewm_multi", "q_rolling_time",
    # round 3 (CORRECTNESS_r03.json, 50/50 fully green)
    "q_asof", "q_asof_join", "q_asof_tolerance", "q_asof_forward",
    "q_cogroup_asof", "q_self_join", "q_pairwise", "q_pairwise_kernel",
    "q_gnn_lite", "q_seq_prep", "q_physics_baseline", "q_fold_assign",
    "q_ensemble_features", "q_range_join", "q_traj_similarity", "q_holt",
    "q_stream_tumbling", "q_stream_session", "q_stream_ewm",
    "q_stream_sliding", "q_stream_dedup", "q_stream_join",
    "q_stream_static_join", "q_stream_mv_rollup", "q_stream_running_stats",
    "q_stream_join_left", "q_stream_cdc_upsert", "q_stream_python_source",
    "q_setsim_join", "q_bigram_logprob", "q_audio_features",
    "q_image_decode", "q_png_decode", "q_dedup_exact", "q_minhash_lsh",
    "q_simhash", "q_ngram_jaccard", "q_dedup_components", "q_embed_neardup",
    "q_embed_cosine_topk", "q_embed_ivf_topk", "q_lang_id",
    "q_quality_score", "q_token_count", "q_doc_fingerprint",
    "q_stratified_sample", "q_corpus_mix", "q_split_assign",
    "q_sample_exact_n", "q_percentiles_by_group",
    # round 4 (CORRECTNESS_r04.json, 50/50 fully green)
    "q_ann_recall", "q_attribution", "q_auc", "q_bfs_levels", "q_bm25",
    "q_brier", "q_calibration", "q_cdc_apply", "q_cdc_asof",
    "q_char_entropy", "q_compaction_plan", "q_confusion",
    "q_decontaminate", "q_dedup_apply", "q_dedup_stats", "q_degree_dist",
    "q_edit_distance", "q_feature_hash", "q_funnel", "q_gaps_islands",
    "q_gopher_rules", "q_ks_stat", "q_lateral_topk", "q_lift",
    "q_line_dedup", "q_link_predict", "q_logloss", "q_minhash_error",
    "q_mrr", "q_ndcg", "q_pagerank", "q_pq_quantize", "q_pq_search",
    "q_pr_auc", "q_psi", "q_retention", "q_rolling_dau", "q_scd2",
    "q_skipgram_pairs", "q_snapshot_diff", "q_sql_pipe", "q_stl_lite",
    "q_target_encode", "q_tfidf_topk", "q_triangle_count", "q_try_cast",
    "q_udtf_polymorphic", "q_unigram_logprob", "q_vocab_topn",
    "q_zorder_cells",
    # round 5 (CORRECTNESS_r05.json, 50/50 fully green)
    "q_ab_test", "q_arrow_grouped", "q_arrow_map", "q_assoc_rules",
    "q_autocorr", "q_benford", "q_bpe_pairs", "q_correlated_subquery",
    "q_crosstab", "q_cusum", "q_dataset_card", "q_embed_components",
    "q_expanding", "q_ffill", "q_forecast_revenue", "q_geo_join",
    "q_geo_track", "q_gini", "q_group_entropy", "q_histogram",
    "q_interpolate", "q_join_nullsafe", "q_logit_irls", "q_mad_outliers",
    "q_markov_transition", "q_max_drawdown", "q_moments", "q_mutual_info",
    "q_observe", "q_ols_by_group", "q_pandas_scalar", "q_peak_concurrency",
    "q_recursive_cte", "q_regex_tokens", "q_repetition_score", "q_resample",
    "q_ridge_fit", "q_seasonal_anomaly", "q_session_window", "q_spearman",
    "q_sql_param", "q_sql_udf", "q_survival", "q_ttr",
    "q_udaf_weighted_median", "q_udtf_sentences", "q_vwap", "q_welch_ttest",
    "q_winsorize", "q_zscore_outliers",
    # rounds 6+7 (CORRECTNESS_r06.json ≡ CORRECTNESS_r07.json, the
    # same 50 names fully green in two independent driver runs)
    "q_except", "q_schema_evolution", "q_setsim_join",
    "q_dedup_components", "q_embed_components", "q_bpe_train",
    "q_bpe_vocab", "q_bpe_encode", "q_dsir_weights",
    "q_gumbel_topk_resample", "q_dp_count", "q_pmi_cooccur",
    "q_keyword_extract", "q_ngram_novelty", "q_naive_bayes",
    "q_entity_resolution", "q_leakage_audit", "q_token_budget_trim",
    "q_temporal_split", "q_code_detect", "q_contrastive_pairs",
    "q_knn_classify", "q_minhash_containment", "q_matryoshka_recall",
    "q_als_step", "q_bootstrap_ci", "q_window_funnel", "q_stream_funnel",
    "q_percentile_rank", "q_seasonal_index", "q_asof_nearest",
    "q_winnowing_fingerprint", "q_mv_incremental", "q_qoi_decode",
    "q_gif_decode", "q_pgm_decode", "q_spectral_bins", "q_cms_topk",
    "q_hll_audit", "q_bloom_audit", "q_label_propagation", "q_kcore",
    "q_modularity", "q_holt_winters", "q_anova", "q_kendall_tau",
    "q_mannwhitney", "q_chi_square", "q_changepoint", "q_rfm",
    # round 8 (CORRECTNESS_r08.json, 49/50 fully green — the sole red
    # row, q_embed_quantize, is re-windowed below post-fix)
    "q_cluster_quality", "q_cust_order_dist", "q_embed_centroid",
    "q_embed_lsh_bucket", "q_embed_norm", "q_embed_project",
    "q_emd_drift", "q_frame_sample", "q_heaps_law", "q_idle_customers",
    "q_kmeans_iter2", "q_kmeans_step", "q_late_supplier", "q_listagg",
    "q_market_share", "q_min_cost_supp", "q_multimodal_decode",
    "q_neardup_threshold_sweep", "q_or_pushdown", "q_pending_priority",
    "q_power_iteration", "q_product_profit", "q_python_datasink",
    "q_range_frame", "q_scalar_native", "q_semdedup", "q_seq_pattern",
    "q_small_qty_revenue", "q_sort_nulls", "q_stream_funnel_late",
    "q_stream_funnel_ttl", "q_stream_session_dynamic",
    "q_stream_tumbling_late", "q_supplier_audit", "q_table_checksum",
    "q_top_value_parts", "q_twap", "q_union_drift", "q_variant",
    "q_wow_growth", "q_zipf_fit",
    # round 9 (CORRECTNESS_r09.json, 50/50 fully green — the final
    # coverage rotation: all 34 carried never-verified names, the
    # fixed q_embed_quantize, and the round-9 additions landed)
    "q_array_hof", "q_audience_overlap", "q_bigram_topn",
    "q_cohens_kappa", "q_cohort_ltv", "q_corpus_curate",
    "q_dedup_canonical", "q_did", "q_doc_chunk", "q_embed_quantize",
    "q_except_all", "q_explode_outer", "q_histogram_2d",
    "q_intersect_all", "q_interval_merge", "q_item_similarity",
    "q_label_horizon", "q_log_histogram", "q_macro_f1", "q_nth_value",
    "q_paginate", "q_path_topn", "q_perplexity_bucket", "q_redact",
    "q_regex_scan", "q_ri_audit", "q_rsi", "q_scan_binary",
    "q_scan_text", "q_seq_pack", "q_shard_assign", "q_skew_audit",
    "q_substring_dup", "q_text_normalize", "q_xcorr_lags",
    "q_zonemap_audit",
    # rows-only by declared contract (no value oracle): the driver row
    # cannot improve, so don't let them occupy front-window slots.
    "q_approx_distinct", "q_quantile_approx", "q_embed_kmeans",
    "q_image_resize",
})

# Round-10 window (first 50 of queries()): coverage closed at 371/372
# last round, so this window spends its slots on drift re-proof of the
# three highest-churn families plus the one remaining never-verified
# name.  49 drift-reverify greens + q_semdedup_ivf = 50.
#
# Why these drift slots (round-9 VERDICT "Next round" item 5 — with
# coverage closed, re-verify the families rounds 8-10 touched):
# - STREAMING (17): streaming/source.py's twin-session memoization
#   landed round 9 and is rewritten THIS round from an id(spark)-keyed
#   dict to a WeakKeyDictionary (round-9 ADVICE: id() reuse after GC
#   could alias two parents) — a helper change under every streaming
#   query, so the whole family re-proves against the current helper.
# - VECTORS (19): plans/vectors.py gains the round-10 cell-occupancy
#   guard on q_semdedup_ivf's pairwise confirm (the MAX_BRUTE_QUERIES
#   house pattern) — module churn adjacent to every embedding query,
#   plus q_embed_quantize's round-9 serialization fix deserves a
#   second independent green row.
# - DEDUP/TEXT (13): plans/text.py churned round 9 (q_substring_dup,
#   q_dedup_canonical, q_leakage_audit decimal pre-multiply) and its
#   oracle-side closure form is trimmed this round (q_dedup_canonical
#   8x-lane cost, VERDICT item 7).
#
# Pre-flighted at HEAD after every round-10 change: the full-registry
# strict sweep (`python tools/driver_sim.py`) ran 0 failures / 372
# checked, which covers all 50 window members (MEASURED.md round-10
# close); the window-only sweep earlier in the round was also 0/50.
_DRIFT_REVERIFY: tuple[str, ...] = (
    # streaming
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_dedup", "q_stream_ewm", "q_stream_join",
    "q_stream_join_left", "q_stream_static_join", "q_stream_mv_rollup",
    "q_stream_running_stats", "q_stream_python_source",
    "q_stream_tumbling_late", "q_stream_funnel_late",
    "q_stream_funnel_ttl", "q_stream_cdc_upsert", "q_stream_funnel",
    "q_stream_session_dynamic",
    # vectors
    "q_embed_neardup", "q_embed_cosine_topk", "q_embed_ivf_topk",
    "q_ann_recall", "q_pq_quantize", "q_pq_search", "q_kmeans_step",
    "q_kmeans_iter2", "q_semdedup", "q_knn_classify",
    "q_matryoshka_recall", "q_contrastive_pairs",
    "q_neardup_threshold_sweep", "q_embed_components",
    "q_embed_quantize", "q_embed_centroid", "q_embed_lsh_bucket",
    "q_embed_norm", "q_embed_project",
    # dedup / text
    "q_dedup_exact", "q_dedup_apply", "q_dedup_stats",
    "q_dedup_canonical", "q_substring_dup", "q_minhash_lsh",
    "q_minhash_error", "q_minhash_containment", "q_simhash",
    "q_ngram_jaccard", "q_setsim_join", "q_dedup_components",
    "q_leakage_audit",
)

_PRIORITY: tuple[str, ...] = (
    # plan-drift re-verification (see _DRIFT_REVERIFY)
    *_DRIFT_REVERIFY,
    # the ONE remaining never-driver-verified name: landed in the
    # round-9 end-of-round snapshot after that round's strict sweep
    # ran (round-9 VERDICT "What's wrong" #2) — its evidence package
    # (semantics test, driver_sim row, 8x honest row) lands this round
    "q_semdedup_ivf",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    prio = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    pending = {
        n: f for n, f in QUERIES.items()
        if n not in _DRIVER_GREEN and n not in prio
    }
    done = {n: f for n, f in QUERIES.items() if n in _DRIVER_GREEN}
    return {**prio, **pending, **done}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
