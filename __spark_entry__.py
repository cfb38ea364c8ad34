"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship item_info query at sf0.001.
``queries()`` maps SURVEY.md §2 operator IDs to PySpark implementations;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alma_publish_to_marc_spark.session import tune
from alma_publish_to_marc_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    from alma_publish_to_marc_spark.plans.item_info import item_info
    return item_info(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key."""
    return registry.oracle_sql()
