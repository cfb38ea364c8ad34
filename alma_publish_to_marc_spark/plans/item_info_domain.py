"""The real `item_info` reporting view over warehouse entity DataFrames
(`/root/reference/ddl/data_sync_db.sql:445-507`) — OP-J4/J5/J6/J7/J8
composed Spark-first, plus the README acceptance point-lookups
(`README.md:62-74`).

Plan shape at 100 TB: item/item_base_status/item_data co-shuffle on pid
(sort-merge joins on the same key reuse one exchange); holding/bib
briefs join on their keys; location and code-table dims broadcast; the
as-of join is one window over request_event; the three correlated
counts are partial-aggregated on their keys and broadcast back when
small. No correlated per-row subquery execution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_request_per_pid(request_event: DataFrame) -> DataFrame:
    """OP-J7/OP-W1: the view's as-of join — each item's most recent
    request (max notification_date_time per pid), then the
    non-HISTORY filter applied to the winner (same order of operations
    as the SQL: rank on time, THEN status test)."""
    w = Window.partitionBy("pid").orderBy(F.desc("notification_date_time"),
                                          F.desc("request_id"))
    return (request_event
            .where(F.col("pid").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("request_status") != "HISTORY"))
            .select(
                "pid",
                F.col("request_id"),
                F.col("notification_date_time").alias("request_update_date_time"),
                "request_status", "request_type", "request_sub_type",
                "request_date", "request_event",
                F.col("pickup_location_library").alias("request_pickup_location"),
            ))


def request_counts(request_event: DataFrame) -> dict[str, DataFrame]:
    """OP-J8/OP-A6: the three correlated scalar counts as pre-aggregates."""
    live = request_event.where(F.col("request_status") != "HISTORY")
    return {
        "item": (live.where(F.col("pid").isNotNull())
                 .groupBy("pid").agg(F.count(F.lit(1)).alias("request_count"))),
        "holding": (live.where(F.col("pid").isNull()
                               & F.col("holding_id").isNotNull())
                    .groupBy("holding_id")
                    .agg(F.count(F.lit(1)).alias("holding_level_request_count"))),
        "bib": (live.where(F.col("pid").isNull() & F.col("holding_id").isNull())
                .groupBy("mms_id")
                .agg(F.count(F.lit(1)).alias("bib_level_request_count"))),
    }


def item_info_view(item: DataFrame, item_base_status: DataFrame,
                   item_data: DataFrame, location: DataFrame,
                   holding_brief: DataFrame, bib_brief: DataFrame,
                   code_table_value: DataFrame,
                   request_event: DataFrame) -> DataFrame:
    status_dim = (code_table_value
                  .where(F.col("code_table") == "BaseStatus")
                  .select(F.col("code").alias("status_code"),
                          F.col("description").alias("status")))
    perm_loc = location.select(
        F.col("id").alias("perm_location_id"),
        F.col("library_code").alias("perm_library_code"),
        F.col("code").alias("perm_location_code"))
    temp_loc = location.select(
        F.col("id").alias("temp_location_id"),
        F.col("library_code").alias("temp_library_code"),
        F.col("code").alias("temp_location_code"))
    bs = item_base_status.select(
        "pid", "status_code", "process_type", "process_status",
        "renewal_date", "loan_date", "due_date",
        F.col("update_date_time").alias("status_update_date_time"))
    counts = request_counts(request_event)
    latest = latest_request_per_pid(request_event)

    out = (
        item
        .join(bs, "pid")                                   # OP-J4 …
        .join(item_data.select("pid", "data"), "pid")
        .join(F.broadcast(perm_loc), "perm_location_id")
        .join(holding_brief.select("holding_id", "mms_id",
                                   "display_call_number"), "holding_id")
        .join(bib_brief.select("mms_id", "title", "author"), "mms_id")
        .join(F.broadcast(status_dim), "status_code")      # OP-J5
        .join(F.broadcast(temp_loc), "temp_location_id", "left")  # OP-J6
        .join(latest, "pid", "left")                       # OP-J7
        .join(counts["item"], "pid", "left")               # OP-J8 ×3
        .join(counts["holding"], "holding_id", "left")
        .join(counts["bib"], "mms_id", "left")
        .withColumn("request_count",
                    F.coalesce("request_count", F.lit(0)))
        .withColumn("holding_level_request_count",
                    F.coalesce("holding_level_request_count", F.lit(0)))
        .withColumn("bib_level_request_count",
                    F.coalesce("bib_level_request_count", F.lit(0)))
    )
    return out


# --- README acceptance queries (README.md:62-74) ---------------------------
def lookup_by_barcode(item_info: DataFrame, barcode: str) -> DataFrame:
    return item_info.where(F.col("barcode") == barcode)


def lookup_by_mms_id(item_info: DataFrame, mms_id: str) -> DataFrame:
    return item_info.where(F.col("mms_id") == mms_id)


def call_number_type_from_json(item_info: DataFrame) -> DataFrame:
    """`data::json#>'{holding_data,call_number_type,value}'`
    (README.md:65) → get_json_object."""
    return item_info.select(
        "pid",
        F.get_json_object("data", "$.holding_data.call_number_type.value")
         .alias("call_number_type"))


def items_in_location(item_info: DataFrame, library_code: str,
                      location_code: str) -> DataFrame:
    return item_info.where(
        (F.col("perm_library_code") == library_code)
        & (F.col("perm_location_code") == location_code))
