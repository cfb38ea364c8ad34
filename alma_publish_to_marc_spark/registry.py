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
    return merged


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
