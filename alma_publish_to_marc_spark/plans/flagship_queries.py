"""queries()/oracle_sql() entries for the flagship plan and its pieces."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .item_info import ITEM_INFO_SQL, event_counts_per_user, item_info, latest_event_per_user


def _asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-J7/OP-W1 in isolation: latest event per user. No output sort:
    the driver's compare is order-insensitive, and a global orderBy
    would add a range-partition shuffle to every run."""
    return latest_event_per_user(load(spark, sf_dir, "events"))


_ASOF_SQL = """
SELECT user_id, event_type AS last_event_type, ts AS last_event_ts
FROM (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


def _correlated_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-J8/OP-A6 in isolation: filtered per-key counts."""
    return event_counts_per_user(load(spark, sf_dir, "events"))


_COUNTS_SQL = """
SELECT user_id,
       count(CASE WHEN event_type <> 'error' THEN 1 END) AS event_cnt,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error_cnt
FROM events GROUP BY user_id
"""


def _point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's acceptance queries are point lookups on item_info
    (barcode / mms_id, README.md:62-67), served there by b-tree indexes.
    Here the key filter lands on top of the view and Catalyst pushes it
    through every join to the scans — the columnar analog of the index
    path (parquet min/max + dictionary skip the irrelevant row groups)."""
    return item_info(spark, sf_dir).where(F.col("c_custkey") == 42)


_POINT_LOOKUP_SQL = (
    "SELECT * FROM (" + ITEM_INFO_SQL + ") WHERE c_custkey = 42"
)


QUERIES = {
    "item_info_flagship": (item_info, ITEM_INFO_SQL),
    "asof_latest_event": (_asof_latest, _ASOF_SQL),
    "correlated_event_counts": (_correlated_counts, _COUNTS_SQL),
    "item_info_point_lookup": (_point_lookup, _POINT_LOOKUP_SQL),
}
