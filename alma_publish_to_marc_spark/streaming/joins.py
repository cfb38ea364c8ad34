"""Stream-stream interval join: view→purchase attribution.

The one Structured Streaming join shape production attribution actually
runs: two UNBOUNDED event streams joined on key + an event-time range
(purchase within 1 hour after a view). Spark keeps both sides in the
state store and evicts rows once the watermark passes the range bound —
the range condition is what makes the state finite, so it is part of
the JOIN CONDITION, never a post-filter.

One code path for batch and streaming (the module convention of
streaming/windows.py): `withWatermark` is a no-op in batch, so the
oracle gate checks in batch exactly what each micro-batch executes.

Reference anchor: the reference joins publish events to their
config/set rows statically (alma_publish_to_database.py); an interval
join is its event-time generalization for unbounded inputs.

Scale: state is bounded by (watermark horizon × per-key arrival rate)
per side; the join shuffles both streams on user_id once. At 100 TB/day
the horizon (1 h + 1 h slack) keeps the store to the hot window only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "1 hour"
# Late-data slack: views may arrive up to 2 h late, purchases 1 h.
VIEW_DELAY, PURCHASE_DELAY = "2 hours", "1 hour"


def attributed_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """(view, purchase) pairs of the same user with the purchase in
    (view_ts, view_ts + 1 hour]. Columns:
    (user_id, view_id, purchase_id, view_ts, purchase_ts, latency_us).

    Works unchanged on batch frames (watermarks are no-ops) and on
    streaming frames (watermarks bound the join state). latency_us is
    exact integer microseconds — the cross-engine-safe timestamp
    arithmetic (CLAUDE.md).
    """
    v = (views.withWatermark("ts", VIEW_DELAY)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts")))
    p = (purchases.withWatermark("ts", PURCHASE_DELAY)
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts")))
    return (v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts")
           <= F.col("view_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")))
        .select(F.col("v_user").alias("user_id"), "view_id", "purchase_id",
                "view_ts", "purchase_ts",
                (F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                 - F.unix_micros(F.col("view_ts").cast("timestamp")))
                .alias("latency_us")))
