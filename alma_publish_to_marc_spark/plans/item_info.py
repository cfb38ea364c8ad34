"""The flagship query: the reference's ``item_info`` reporting view
re-expressed over the driver's TPC-H-ish stand-ins.

Reference shape (`/root/reference/ddl/data_sync_db.sql:445-507`): a wide
denormalized view of item ⋈ holding ⋈ bib ⋈ location dims, plus

- an *as-of join* to each item's most recent request event
  (`data_sync_db.sql:504-507`, OP-J7/OP-W1), and
- three *correlated scalar counts* of non-HISTORY requests
  (`data_sync_db.sql:492-494`, OP-J8/OP-A6).

Stand-in mapping (FIXTURES.md §6): lineitem=item, orders=holding,
customer=bib, nation/region=location dims, events=request_event.

Scale notes (100 TB): the three fact-side joins are shuffle hash/sort-merge
on their natural keys; nation/region are broadcast (tiny dims — Spark
auto-broadcasts, we hint anyway). The as-of join is a window over events
partitioned by user_id — one shuffle of the *events* table only, and the
two count aggregates are map-side-combined partial aggregations over the
same shuffle key, so AQE can reuse the exchange. No driver-side collection
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """As-of 'latest' slice: most recent event per user_id (OP-J7/OP-W1).

    row_number over (user_id, ts desc, event_id desc) — the event_id
    tiebreak makes the result deterministic when timestamps collide.
    """
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("user_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_event_ts"),
        )
    )


def event_counts_per_user(events: DataFrame) -> DataFrame:
    """Correlated-count stand-in (OP-J8/OP-A6): per-user counts of
    non-'error' events and of 'error' events, in one aggregation pass."""
    return events.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") != "error", 1)).alias("event_cnt"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_cnt"),
    )


def latest_and_counts_per_user(events: DataFrame) -> DataFrame:
    """OP-J7 + OP-J8 fused: ONE shuffle of events on user_id computes
    both the as-of latest row and the per-user counts (count over the
    unordered partition == groupBy count), and the fact side then joins
    a single per-user frame instead of two. Halves the event exchanges
    and drops one join versus the textbook two-aggregate form."""
    w_all = Window.partitionBy("user_id")
    w_rank = w_all.orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("event_cnt", F.count(
            F.when(F.col("event_type") != "error", 1)).over(w_all))
        .withColumn("error_cnt", F.count(
            F.when(F.col("event_type") == "error", 1)).over(w_all))
        .where(F.col("_rn") == 1)
        .select("user_id",
                F.col("event_type").alias("last_event_type"),
                F.col("ts").alias("last_event_ts"),
                "event_cnt", "error_cnt")
    )


def item_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    events = load(spark, sf_dir, "events")

    per_user = latest_and_counts_per_user(events)

    return (
        lineitem
        .where(F.col("l_quantity") >= 25)          # pushed to the parquet scan
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "inner")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left")
        .join(per_user, F.col("c_custkey") == per_user["user_id"], "left")
        .drop("user_id")
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "o_orderstatus", "o_orderdate",
            "c_custkey", "c_name", "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            "last_event_type", "last_event_ts",
            F.coalesce("event_cnt", F.lit(0)).alias("event_cnt"),
            F.coalesce("error_cnt", F.lit(0)).alias("error_cnt"),
        )
    )


ITEM_INFO_SQL = """
WITH latest AS (
    SELECT user_id, event_type AS last_event_type, ts AS last_event_ts
    FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
),
counts AS (
    SELECT user_id,
           count(CASE WHEN event_type <> 'error' THEN 1 END) AS event_cnt,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error_cnt
    FROM events GROUP BY user_id
)
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
       o.o_orderstatus, o.o_orderdate,
       c.c_custkey, c.c_name, c.c_mktsegment,
       n.n_name AS nation_name,
       r.r_name AS region_name,
       latest.last_event_type, latest.last_event_ts,
       coalesce(counts.event_cnt, 0) AS event_cnt,
       coalesce(counts.error_cnt, 0) AS error_cnt
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN latest ON c.c_custkey = latest.user_id
LEFT JOIN counts ON c.c_custkey = counts.user_id
WHERE l.l_quantity >= 25
"""
