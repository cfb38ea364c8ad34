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
    "alma_publish_to_marc_spark.sources.source_queries",
    "alma_publish_to_marc_spark.streaming.streaming_queries",
    "alma_publish_to_marc_spark.multimodal.multimodal_queries",
)


# Queries whose correctness rows have only ever come from the local
# parity gate (never driver-sampled through r06; union of
# CORRECTNESS_r01..r06 = 136 driver-green keys). Pinned FIRST in
# registry iteration order so a driver that samples in order converts
# them to driver-green rows. ROTATION POLICY: each round this list is
# rebuilt as the next 50 not-yet-driver-sampled keys (union of
# CORRECTNESS_r*.json vs natural module order); driver-green members
# come off next round. Keys are byte-stable; members are only removed
# or rotated, never renamed. 222 pre-round-7 keys remained unsampled
# after this rotation; round 7 added 36 more queries (463 total), so
# ~258 await sampling (~5 more rounds to full driver coverage).
_SAMPLE_FIRST = (
    "minhash_estimator_calibration",
    "ann_graph_label_vote",
    "lexicon_sentiment_score",
    "cohens_kappa_agreement",
    "source_ablation_value",
    "unpivot_metrics",
    "approx_percentile_bounds",
    "asof_prior_event",
    "scd2_intervals",
    "time_gap_fill",
    "variant_json_extract",
    "range_interval_join",
    "grouping_sets_revenue",
    "levenshtein_neardup",
    "tfidf_top_terms",
    "bm25_topk",
    "event_ewma_features",
    "lateral_topk_per_group",
    "value_histogram",
    "inverted_index_build",
    "scd2_point_in_time_join",
    "range_frame_rolling",
    "rag_chunk_retrieval",
    "proximity_phrase_search",
    "nested_roundtrip",
    "map_ops_suite",
    "prf_query_expansion",
    "posting_gap_stats",
    "pipe_syntax_report",
    "duplicate_ngram_spans",
    "duplicate_span_removal",
    "corpus_datacard",
    "longest_dup_span",
    "token_budget_plan",
    "weighted_sample_es",
    "domain_mixture_weights",
    "training_order_shuffle",
    "event_regression_stats",
    "corpus_curation_end2end",
    "bpe_encode_docs",
    "quality_classifier_score",
    "uniform_sample_exact",
    "join_skew_diagnostics",
    "event_drift_monitor",
    "mixture_weighted_sample",
    "curriculum_order",
    "neyman_allocation",
    "boilerplate_segment_removal",
    "systematic_resample",
    "effective_sample_size",
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
