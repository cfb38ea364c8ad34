"""Central registry mapping SURVEY.md §2 operator IDs to
(PySpark implementation, DuckDB oracle SQL) pairs.

Each module that implements operators exposes ``QUERIES`` — a dict of
``name -> (callable(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
This module merges them. Names are stable keys the driver records in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "alma_publish_to_marc_spark.plans.flagship_queries",
    "alma_publish_to_marc_spark.operators.relational_queries",
    "alma_publish_to_marc_spark.functions.scalar_queries",
    "alma_publish_to_marc_spark.operators.dedup_queries",
    "alma_publish_to_marc_spark.operators.upsert_queries",
    "alma_publish_to_marc_spark.operators.similarity_queries",
    "alma_publish_to_marc_spark.operators.embedding_queries",
    "alma_publish_to_marc_spark.functions.text_queries",
    "alma_publish_to_marc_spark.functions.hash_embedding",
    "alma_publish_to_marc_spark.plans.domain_queries",
    "alma_publish_to_marc_spark.plans.extraction_queries",
    "alma_publish_to_marc_spark.plans.analytics_queries",
    "alma_publish_to_marc_spark.plans.corpus_queries",
    "alma_publish_to_marc_spark.plans.lm_queries",
    "alma_publish_to_marc_spark.plans.behavior_queries",
    "alma_publish_to_marc_spark.plans.preference_queries",
    "alma_publish_to_marc_spark.plans.migrations",
    "alma_publish_to_marc_spark.plans.warehouse_bench",
    "alma_publish_to_marc_spark.plans.tpch_queries",
    "alma_publish_to_marc_spark.plans.timeseries_queries",
    "alma_publish_to_marc_spark.plans.eval_queries",
    "alma_publish_to_marc_spark.plans.ir_queries",
    "alma_publish_to_marc_spark.plans.inference_queries",
    "alma_publish_to_marc_spark.plans.storage_queries",
    "alma_publish_to_marc_spark.plans.optimizer_queries",
    "alma_publish_to_marc_spark.plans.governance_queries",
    "alma_publish_to_marc_spark.plans.decision_queries",
    "alma_publish_to_marc_spark.plans.process_queries",
    "alma_publish_to_marc_spark.plans.bi_queries",
    "alma_publish_to_marc_spark.operators.recsys_queries",
    "alma_publish_to_marc_spark.plans.dq_queries",
    "alma_publish_to_marc_spark.operators.graph_queries",
    "alma_publish_to_marc_spark.operators.clustering",
    "alma_publish_to_marc_spark.operators.learning",
    "alma_publish_to_marc_spark.operators.sketches",
    "alma_publish_to_marc_spark.functions.python_udf_queries",
    "alma_publish_to_marc_spark.plans.spatial_queries",
    "alma_publish_to_marc_spark.plans.rank_queries",
    "alma_publish_to_marc_spark.sources.source_queries",
    "alma_publish_to_marc_spark.streaming.streaming_queries",
    "alma_publish_to_marc_spark.multimodal.multimodal_queries",
    "alma_publish_to_marc_spark.plans.posttrain_queries",
    "alma_publish_to_marc_spark.plans.weighting_queries",
)


# Driver-sample pinning. Round-10 policy (VERDICT r9 "Next round" #1):
# the first 38 slots PIN the keys where code is newer than any driver
# confirmation — the 22 queries ADDED in round 9 (posttrain_queries,
# weighting_queries, theta forecast, modality mix, percolation sweep,
# rich-club coefficient), the 6 pre-existing spatial keys whose PLANS
# changed in round 9 (density-adaptive `_side_frame` grid, integerized
# Weiszfeld), and the 10 queries ADDED in round 10 (blocked suffix
# ranking, speculative draft policy, KV planning, Matryoshka recall,
# queue sizing, nucleus cutoff, shuffle QA). The remaining 12 slots
# continue the rotation over never-driver-sampled keys in natural
# module order (union of CORRECTNESS_r01..r09 = 276 driver-green; 282
# of 558 pre-round-10 keys remained unsampled entering round 10). Keys
# are byte-stable; members are only removed or rotated, never renamed.
_SAMPLE_FIRST = (
    # --- round-9-NEW queries (code newer than any driver row) ---
    "grpo_group_advantage",
    "gae_advantage_fold",
    "prompt_prefix_cache_stats",
    "int8_quantization_error",
    "moe_router_balance",
    "checkpoint_interval_daly",
    "context_window_waste",
    "epsilon_greedy_replay",
    "heaps_law_log2_fit",
    "model_cascade_cost",
    "raking_ipf_weights",
    "kalman_filter_1d",
    "jackknife_nation_means",
    "covariate_balance_smd",
    "skewness_kurtosis_profile",
    "ltv_cohort_projection",
    "median_polish_residuals",
    "mean_excess_curve",
    "theta_method_forecast",
    "modality_mix_budget",
    "percolation_radius_sweep",
    "rich_club_coefficient",
    # --- spatial keys whose plans changed in round 9 ---
    "grid_neighbor_join",
    "two_hop_reachability",
    "boruvka_lightest_edges",
    "spatial_hotspot_cells",
    "quadtree_tile_rollup",
    "geometric_median_weiszfeld",
    # --- round-10-NEW queries (same fresh-confirmation logic) ---
    "suffix_lcp_repeats",
    "suffix_repeat_topk",
    "speculative_draft_policy",
    "kv_cache_memory_budget",
    "paged_attention_fragmentation",
    "matryoshka_topk",
    "matryoshka_recall_eval",
    "serving_queue_wait_curve",
    "nucleus_cutoff_profile",
    "shuffle_autocorrelation_audit",
    # --- rotation: next 12 never-driver-sampled keys ---
    "pairwise_winrate_wilson",
    "annotator_agreement_kappa",
    "fleiss_kappa_items",
    "preference_length_bias",
    "preference_transitivity_audit",
    "annotator_position_bias",
    "preference_qa_end2end",
    "elo_rating_trajectory",
    "bucketed_item_info_join",
    "zorder_layout_stats",
    "order_priority_checking",
    "local_supplier_volume",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    import importlib

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ModuleNotFoundError:
            continue  # module not built yet; registry grows as operators land
        for name, pair in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} in {mod_name}")
            merged[name] = pair
    front = {k: merged[k] for k in _SAMPLE_FIRST if k in merged}
    front.update((k, v) for k, v in merged.items() if k not in front)
    return front


def queries() -> dict[str, QueryFn]:
    from alma_publish_to_marc_spark.session import tune

    def wrap(fn: QueryFn) -> QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)  # pin session TZ etc. even on a driver-built session
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _collect().items() if sql is not None}


def release_caches() -> int:
    """Invoke every query module's ``unpersist_cached()`` hook —
    releases tracked persists AND deferred staged-parquet directories
    (ktruss_prune's last round). Harness loops (check_parity,
    explain_audit, bench) call this between queries so a 465-key run
    can't accumulate cache or staging on disk."""
    import importlib

    n = 0
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ModuleNotFoundError:
            continue
        hook = getattr(mod, "unpersist_cached", None)
        if hook is not None:
            n += hook()
    return n
