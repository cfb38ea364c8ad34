"""Physical-plan audit: for each headline query, print the formatted
plan plus a summary of scale-relevant properties — exchange (shuffle)
count, broadcast joins, pushed filters, scan schema width, and
whole-stage-codegen coverage.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]


def summarize(spark, df) -> dict:
    """Scale-relevant physical-plan properties of an (un-executed)
    DataFrame, with AQE disabled for the static view. Keys double as
    the structural contract tests/test_plan_properties.py pins."""
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        cg = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    scans = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    m = re.search(r"Found (\d+) WholeStageCodegen", cg)
    return {
        "shuffles": len(re.findall(r"Arguments: hashpartitioning", plan)),
        "range_shuffles": len(re.findall(r"Arguments: rangepartitioning", plan)),
        "single_part": len(re.findall(r"Arguments: SinglePartition", plan)),
        # windowspecdefinition whose FIRST argument is the frame or an
        # ordered column = no PARTITION BY → the whole input moves to
        # one task (the `WindowExec: No Partition Defined` warning).
        "unpartitioned_windows": len(re.findall(
            r"windowspecdefinition\((?:specifiedwindowframe|"
            r"\S+#\d+\w* (?:ASC|DESC))", plan)),
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "broadcast_nl_joins": len(
            re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "in_memory_scans": len(re.findall(r"InMemoryTableScan", plan)),
        "scans": len(scans),
        "scan_widths": [s.count(":") for s in scans],
        "pushed_filter_scans": sum(1 for p in pushed if p.strip()),
        "codegen_spans": int(m.group(1)) if m else 0,
        "_plan": plan,
    }


def main() -> None:
    from alma_publish_to_marc_spark.session import get_spark
    from alma_publish_to_marc_spark import registry

    spark = get_spark("explain-audit")
    qs = registry.queries()
    names = ONLY or [
        "item_info_flagship", "multiway_join_revenue", "asof_latest_event",
        "last_writer_wins", "collect_list_per_group", "exact_dedup",
        "minhash_lsh_neardup", "ann_cosine_topk", "doc_quality_score",
        "publish_set_grouping", "event_time_windows",
        "window_frame_suite", "range_interval_join", "tfidf_top_terms",
        "doc_chunking", "sequence_packing", "scd2_intervals",
        "time_gap_fill", "grouping_sets_revenue", "levenshtein_neardup",
        "stratified_sample", "dedup_keep_canonical",
        "embedding_neardup", "benchmark_decontamination", "pii_redaction",
        "doc_repetition_stats", "bpe_token_estimate",
        "backfill_item_policy", "backfill_temp_locations",
        "kmeans_fixed_point",
        "duplicate_ngram_spans", "domain_mixture_weights",
        "training_order_shuffle", "event_regression_stats",
        "ann_lsh_topk", "ann_recall_eval", "corpus_curation_end2end",
        "vocab_merge_induction", "incremental_neardup", "blob_printable",
        "quality_classifier_score", "embedding_center_normalize",
        "uniform_sample_exact", "join_skew_diagnostics",
        "event_drift_monitor", "mixture_weighted_sample",
        "curriculum_order", "bucketed_item_info_join",
        "ann_ivf_refined_topk",
        "ngram_lm_perplexity", "bm25_topk", "semantic_dedup",
        "duplicate_span_removal", "bpe_encode_docs", "corpus_datacard",
        "pq_adc_topk", "logreg_train_fixed_point",
        "media_shard_assignment", "event_ewma_features",
        "embedding_decontamination", "token_zipf_fit",
        "conversion_funnel", "cohort_retention", "ks_drift_test",
        "event_transition_matrix", "weighted_sample_es",
        "simhash_neardup", "cross_source_dup_matrix",
        "quality_calibrated_by_source", "inverted_index_build",
        "value_histogram", "range_frame_rolling",
        "scd2_point_in_time_join", "history_retention_purge",
        "iqr_outlier_filter", "pagerank_fixed_point",
        "containment_neardup", "split_leakage_check",
        "preference_pairs", "pq_rerank_topk", "token_budget_plan",
        "full_outer_reconcile", "longest_dup_span",
        "hopping_window_counts", "lateral_topk_per_group",
        "media_byte_features",
        "kmv_distinct_estimate", "hll_distinct_estimate",
        "cms_heavy_hitters", "knn_graph_topk", "hybrid_rank_fusion",
        "pmi_collocations", "naive_bayes_confusion",
        "label_propagation", "knn_triangle_census",
        "shipping_priority_topn", "returned_item_revenue",
        "market_basket_rules", "dq_constraint_audit", "snapshot_diff",
        "mmr_diversified_topk", "zorder_layout_stats", "bloom_filter_fpr",
        "histogram_quantile_sketch", "seasonal_baseline_outliers",
        "dp_noised_counts", "rag_chunk_retrieval", "kmv_join_overlap",
        "incremental_agg_maintenance", "pareto_frontier",
        "kfold_balance_audit", "sampled_mean_ci", "neyman_allocation",
        "pca_power_iteration", "last_touch_attribution",
        "hll_merge_check", "table_stats_profile", "winsorized_stats",
        "cdc_chunk_dedup", "geo_neighbor_join", "cusum_changepoint",
        "event_sequence_patterns", "json_schema_infer",
        "doc_hash_embedding", "content_neardup_hashed",
        "table_merkle_root", "kcore_decomposition", "bfs_levels",
        "graph_random_walks", "bloom_semijoin_reduction",
        "sorted_neighborhood_pairs", "sprt_sequential_test",
        "pricing_summary_report", "embedding_corr_pairs",
        "rolling_active_users",
        # TPC-H analog suite (plans/tpch_queries.py)
        "order_priority_checking", "local_supplier_volume",
        "forecast_revenue_change", "volume_shipping",
        "promo_revenue_effect", "national_market_share",
        "product_type_profit", "important_part_value",
        "shipmode_priority", "customer_distribution",
        "min_cost_supplier", "top_supplier_revenue",
        "parts_supplier_relationship", "small_quantity_revenue",
        "large_volume_customer", "discounted_revenue",
        "potential_promotion", "waiting_orders_supplier",
        "global_sales_opportunity",
        "acf_daily_events", "crosscorr_event_types",
        "item_item_recs", "personalized_part_recs",
        "holt_linear_forecast", "rake_keywords",
        "k_anonymity_audit", "fellegi_sunter_scoring",
        "rfm_segmentation", "apriori_triples",
        "match_recognize_funnel", "cooldown_dedup",
        "benford_audit", "gini_spend_concentration",
        "bellman_ford_distances",
        "incremental_join_maintenance", "watermark_late_audit",
        "conversion_latency_quartiles", "warehouse_close_end2end",
        "psi_drift_report", "cross_modal_retrieval",
        "proximity_phrase_search", "nested_roundtrip",
        "decision_stump_split_search", "kaplan_meier_churn",
        "prefix_filter_jaccard_join", "theil_sen_trend",
        "dbscan_geo_clusters", "peak_concurrency",
        "auc_mann_whitney", "poisson_bootstrap_ci", "max_drawdown_curve",
        "rolling_ols_slope", "anova_eta_squared", "chi2_independence",
        "abandonment_rate_daily", "position_based_attribution",
        "diff_in_differences", "simpsons_paradox_scan",
        "walk_pmi_similarity", "absorption_to_purchase",
        "xmr_control_chart", "dow_seasonality_strength",
        # round 5c: preference QA, classifier evals, shift metrics
        "bradley_terry_strength", "pairwise_winrate_wilson",
        "annotator_agreement_kappa", "preference_transitivity_audit",
        "preference_qa_end2end", "isotonic_calibration",
        "brier_decomposition", "roc_curve_points",
        "fairness_group_audit", "wasserstein_source_shift",
        "negative_sampling_table", "greedy_coverage_selection",
        "map_ops_suite", "forecast_backtest_mase",
        # round 5d: inference, causal, retrieval, time-series exacts
        "cuped_variance_reduction", "personalized_pagerank",
        "median_ci_order_stats", "prf_query_expansion",
        "kendall_tau_rankings", "timeseries_motif_discovery",
        "empirical_bayes_shrinkage", "permutation_test_pvalue",
        "stratified_att_estimate", "fdr_bh_correction",
        "dp_sparse_vector", "shapley_channel_attribution",
        "binseg_changepoint", "dtw_series_distance",
        "competing_risks_incidence", "slo_burn_rate_alerts",
        "posting_gap_stats", "als_rank1_sweep",
        "kmeans_silhouette_sampled", "overdispersion_check",
        "chi2_cell_residuals", "seasonal_decomposition",
        "packing_efficiency_audit", "time_weighted_average",
        # round 6: eval family (plans/eval_queries.py) + tokenizer DP
        "retrieval_ranking_metrics", "rouge_overlap_eval",
        "bleu_ngram_eval", "viterbi_state_decode",
        "hampel_outlier_filter", "shard_diversity_index",
        "did_estimator", "markov_next_event_eval",
        "contrastive_pair_batches", "unigram_lm_segment",
        "behavior_alignment_score", "trajectory_similarity_topk",
        "lexicon_sentiment_score", "cardinality_estimate_eval",
        "bitext_candidate_mining", "cohens_kappa_agreement",
        "source_ablation_value", "pipe_syntax_report",
        "hll_cube_rollup", "hll_rolling_distinct",
        "audio_constellation_match", "t5_span_corruption",
        "mlm_masking_plan", "fim_transform",
    ]
    for name in names:
        if name not in qs:
            continue
        df = qs[name](spark, SF_DIR)
        # AQE wraps un-executed plans in AdaptiveSparkPlan, under which
        # the "codegen" explain reports 0 WholeStageCodegen subtrees
        # (compiled only at execution). Disable it AFTER building the
        # frame so the audit sees the static plan, and restore the
        # previous value in `finally` — anything built in this session
        # outside the registry wrappers (whose tune() re-enables AQE)
        # must not silently plan without it.
        props = summarize(spark, df)
        plan = props.pop("_plan")
        print(f"== {name}: " + " ".join(
            f"{k}={v}" for k, v in props.items()))
        if "-v" in sys.argv or os.environ.get("AUDIT_VERBOSE"):
            print(plan)


if __name__ == "__main__":
    main()
