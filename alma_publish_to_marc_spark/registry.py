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


# Driver-sample pinning. Round-9 policy (VERDICT r8 "Next round" #1):
# the first 10 slots RE-PIN the §2 reference-surface core — those keys
# were last driver-confirmed in r01/r05 and 70+ commits have shipped
# since, so they get fresh driver-green rows on the current codebase.
# The remaining 40 slots continue the rotation: the next never-sampled
# keys in natural module order (union of CORRECTNESS_r01..r08 = 236
# driver-green; 300 of 536 keys remained unsampled entering round 9).
# Keys are byte-stable; members are only removed or rotated, never
# renamed.
_SAMPLE_FIRST = (
    # --- §2 core re-pins (previously green r01/r05; re-confirm) ---
    "publish_split_bibs",
    "publish_split_holdings",
    "publish_split_items",
    "item_info_flagship",
    "marc_field_extraction",
    "marc_size_guard",
    "versioned_temporal_merge",
    "backfill_item_policy",
    "backfill_temp_locations",
    "delete_with_history",
    # --- rotation: next 40 never-driver-sampled keys ---
    "collated_group_counts",
    "greedy_pair_matching",
    "repetition_filter_audit",
    "gopher_rules_audit",
    "token_stream_packing",
    "vocab_coverage_at_k",
    "position_based_attribution",
    "diff_in_differences",
    "absorption_to_purchase",
    "new_vs_returning_users",
    "transition_entropy_profile",
    "interarrival_burstiness",
    "decayed_leaderboard",
    "ips_offline_policy_eval",
    "markov_next_event_accuracy",
    "srm_assignment_check",
    "uplift_by_engagement",
    "purged_timeseries_split",
    "exactly_once_dedup_replay",
    "cuped_variance_reduction",
    "median_ci_order_stats",
    "permutation_test_pvalue",
    "stratified_att_estimate",
    "fdr_bh_correction",
    "dp_sparse_vector",
    "shapley_channel_attribution",
    "competing_risks_incidence",
    "chi2_cell_residuals",
    "logrank_test",
    "interval_union_length",
    "sample_ratio_mismatch",
    "qini_curve_deciles",
    "rmst_survival",
    "markov_removal_attribution",
    "cramers_v_association",
    "dau_wau_stickiness",
    "chain_ladder_projection",
    "km_greenwood_ci",
    "nrr_by_cohort",
    "bradley_terry_strength",
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
