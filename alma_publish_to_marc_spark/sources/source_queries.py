"""Oracle-checked queries for the file-planning sources:

- SRC-5 publish-set grouping (`file_prefix`/`group_files`,
  alma_publish_parser.py:310-328): strip the `_<kind>_<seq>.tar.gz`
  suffix, group files by the remaining publish-set prefix. The
  reference's sequential-set barrier (process one group at a time)
  stays driver-side orchestration (SURVEY.md §4); the grouping itself
  is a plain groupBy.
- OP-S1 file-order sort (`all_files.sort()`,
  alma_publish_parser.py:286,298): lexicographic order inside each
  group via `array_sort(collect_list(...))` — deterministic without a
  global sort.
- SRC-6 routing sits in the same query: `delete`-named files counted
  per group (the reference pulls them off the thread pool,
  alma_publish_parser.py:335-337).
- SRC-18 warehouse-catalog inventory (see warehouse_ddl.py — the DDL
  bootstrap itself is exercised by tests/test_warehouse_ddl.py; this
  query exposes the declared inventory to the correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..warehouse_ddl import WAREHOUSE_TABLES


def publish_set_prefix(name: Column) -> Column:
    """file_prefix (alma_publish_parser.py:310-312): two suffix strips —
    `_<kind>_<seq>.tar.gz` then `_<kind>.tar.gz`."""
    out = F.regexp_replace(name, r"_[a-z]+_\d+\.tar\.gz$", "")
    return F.regexp_replace(out, r"_[a-z]+.tar\.gz$", "")


def group_publish_sets(files: DataFrame, name_col: str = "file_name") -> DataFrame:
    """SRC-5: one row per publish set — file count, delete-manifest
    count (SRC-6 routing), and the lexicographically-ordered member
    list (OP-S1). At 100 TB the grouping is a tiny metadata aggregate
    (file listing, not data), so a single shuffle on the prefix is
    free relative to the scans it schedules."""
    name = F.col(name_col)
    return (files
            .groupBy(publish_set_prefix(name).alias("publish_set"))
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.count(F.when(name.contains("delete"), 1))
                  .alias("n_delete_files"),
                 # joined string, not array<string>: the driver's
                 # canonicalizer raw-sorts pandas frames and ndarray
                 # cells crash its lexsort (CORRECTNESS_r05 red row)
                 F.array_join(F.array_sort(F.collect_list(name)), "|")
                  .alias("files")))


def _publish_set_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    kind = F.when(F.col("o_orderkey") % 7 == 0, "delete").otherwise("new")
    name = F.concat(F.lit("incremental-20240101_"),
                    (F.col("o_custkey") % 40).cast("string"),
                    F.lit("_"), kind, F.lit("_"),
                    F.col("o_orderkey").cast("string"), F.lit(".tar.gz"))
    return group_publish_sets(orders.select(name.alias("file_name")))


_PUBLISH_SET_SQL = r"""
WITH f AS (
    SELECT 'incremental-20240101_' || CAST(o_custkey % 40 AS VARCHAR) || '_'
           || CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'new' END
           || '_' || CAST(o_orderkey AS VARCHAR) || '.tar.gz' AS file_name
    FROM orders
)
SELECT regexp_replace(regexp_replace(file_name, '_[a-z]+_\d+\.tar\.gz$', ''),
                      '_[a-z]+.tar\.gz$', '') AS publish_set,
       count(*) AS n_files,
       count(CASE WHEN file_name LIKE '%delete%' THEN 1 END) AS n_delete_files,
       array_to_string(list_sort(list(file_name)), '|') AS files
FROM f GROUP BY 1
"""


def _warehouse_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC-18: the declared 19-table warehouse inventory (name, column
    count, clustering key) — the Spark-catalog restatement of
    ddl/data_sync_db.sql:46-343."""
    rows = [(t, len(cols), ",".join(key))
            for t, (cols, key) in WAREHOUSE_TABLES.items()]
    return spark.createDataFrame(
        rows, "table_name string, n_columns int, cluster_key string")


def _warehouse_catalog_sql() -> str:
    rows = ", ".join(
        f"('{t}', {len(cols)}, '{','.join(key)}')"
        for t, (cols, key) in WAREHOUSE_TABLES.items())
    return ("SELECT * FROM (VALUES " + rows +
            ") AS t(table_name, n_columns, cluster_key)")


QUERIES = {
    "publish_set_grouping": (_publish_set_grouping, _PUBLISH_SET_SQL),
    "warehouse_catalog": (_warehouse_catalog, _warehouse_catalog_sql()),
}
