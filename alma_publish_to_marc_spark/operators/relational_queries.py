"""queries()/oracle_sql() entries exercising §2.3–2.7 relational operators
on the driver's TPC-H stand-ins (FIXTURES.md §6 mapping)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import EVENT_TYPES as _EVENT_TYPES
from ..tables import load
from . import relational as R


# --- OP-J1: broadcast dimension lookup (supplier -> nation -> region) ----
def _broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "s_nationkey")
    region = load(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    out = R.broadcast_lookup(supplier, nation, ["s_nationkey"])
    out = R.broadcast_lookup(out, region, ["n_regionkey"])
    return out.select("s_suppkey", "s_name",
                      F.col("n_name").alias("nation_name"),
                      F.col("r_name").alias("region_name"))


_BROADCAST_LOOKUP_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name, r.r_name AS region_name
FROM supplier s
LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# --- OP-J2/J3: anti-join delete set ------------------------------------
def _anti_join_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent large order = the 'stale rows to delete'
    set (the >200000 filter keeps the result non-trivial at every sf)."""
    customer = load(spark, sf_dir, "customer")
    recent = (load(spark, sf_dir, "orders")
              .where(F.col("o_totalprice") > 200000)
              .withColumnRenamed("o_custkey", "c_custkey"))
    return (R.anti_join_deletes(customer, recent, ["c_custkey"])
            .select("c_custkey", "c_name", "c_mktsegment"))


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
"""


# --- OP-J9: semi-join existence check -----------------------------------
def _semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    big = (load(spark, sf_dir, "orders")
           .where(F.col("o_totalprice") > 300000)
           .withColumnRenamed("o_custkey", "c_custkey"))
    return R.semi_join(customer, big, ["c_custkey"]).select("c_custkey", "c_name")


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


# --- OP-J10: self-referential edge join (bib_part analog) ---------------
def _self_join_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("mms_id"),
                      F.col("n_name").alias("host_name"),
                      F.col("n_regionkey").alias("rk"))
    b = nation.select(F.col("n_nationkey").alias("part_mms_id"),
                      F.col("n_name").alias("part_name"),
                      F.col("n_regionkey").alias("rk"))
    return (a.join(b, on="rk")
             .where(F.col("mms_id") < F.col("part_mms_id"))
             .select("mms_id", "part_mms_id", "host_name", "part_name"))


_SELF_JOIN_SQL = """
SELECT a.n_nationkey AS mms_id, b.n_nationkey AS part_mms_id,
       a.n_name AS host_name, b.n_name AS part_name
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
"""


# --- OP-J4/J5: multi-way join with constant-filtered dimension ----------
def _multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation through a 6-table join; the
    region filter is the OP-J5 'constant predicate on the dim' pattern —
    filter the dim BEFORE the join so the broadcast side stays minimal."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_MULTIWAY_SQL = """
SELECT n.n_name AS nation_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'EUROPE'
GROUP BY n.n_name
"""


# --- OP-W3: last-writer-wins per key ------------------------------------
def _last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (R.latest_per_key(events, ["user_id", "event_type"], "ts", ["event_id"])
            .select("user_id", "event_type",
                    F.col("ts").alias("last_ts"),
                    F.col("value").alias("last_value")))


_LWW_SQL = """
SELECT user_id, event_type, ts AS last_ts, value AS last_value
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


# --- OP-A7: first-per-group (analytics first-row-per-pid) ----------------
def _first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (R.first_per_group(events, ["user_id"], ["ts", "event_id"])
            .select("user_id",
                    F.col("event_type").alias("first_event_type"),
                    F.col("ts").alias("first_ts")))


_FIRST_SQL = """
SELECT user_id, event_type AS first_event_type, ts AS first_ts
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS rn
    FROM events
) WHERE rn = 1
"""


# --- OP-W2: adjacent-change detection ------------------------------------
def _changed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    out = R.changed_rows(events, ["user_id"], "event_id", "event_type")
    return out.where(F.col("changed")).select("user_id", "event_id", "event_type")


_CHANGED_SQL = """
SELECT user_id, event_id, event_type
FROM (
    SELECT user_id, event_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
    FROM events
) WHERE prev IS NULL OR prev <> event_type
"""


# --- OP-A5: max-per-group -------------------------------------------------
def _max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_totalprice").alias("max_price"),
        F.max("o_orderdate").alias("latest_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_MAX_SQL = """
SELECT o_custkey AS c_custkey, max(o_totalprice) AS max_price,
       max(o_orderdate) AS latest_order, count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# --- OP-A2/OP-A3: distinct + collect_set ------------------------------------
def _distinct_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.countDistinct("event_type").alias("n_types"),
    )


_DISTINCT_COLLECT_SQL = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


# --- OP-A8: collect_list per group (items-per-holding) --------------------
def _collect_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.array_join(
            F.array_sort(F.collect_list("l_linenumber")).cast("array<string>"), ","
        ).alias("linenumbers"),
        F.count(F.lit(1)).alias("n_items"),
    )


_COLLECT_SQL = """
SELECT l_orderkey AS o_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
       count(*) AS n_items
FROM lineitem GROUP BY l_orderkey
"""


# --- OP-A4: group-size assertion -> error stream --------------------------
def _group_size_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference rejects records whose holdings count mismatches the
    control-group count (`alma_publish_parser.py:108-110`); stand-in:
    orders whose lineitem count exceeds 6 are routed to the error stream."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey"))
            .agg(F.count(F.lit(1)).alias("n_items"))
            .where(F.col("n_items") > 6))


_GROUP_SIZE_SQL = """
SELECT l_orderkey AS o_orderkey, count(*) AS n_items
FROM lineitem GROUP BY l_orderkey HAVING count(*) > 6
"""


# --- OP-S2: priority select (ISBN-13-first analog) -------------------------
def _priority_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference promotes the first ISBN with len>=13 to the front, else
    keeps the original first (`marc/helper.py:116-127`). Stand-in: per
    customer pick the earliest order with totalprice>=200000, else the
    earliest order overall. One aggregation pass with conditional min on
    a (price-qualifies, orderdate, orderkey) struct — no join, no window."""
    orders = load(spark, sf_dir, "orders")
    qual = F.when(F.col("o_totalprice") >= 200000,
                  F.struct("o_orderdate", "o_orderkey"))
    anyo = F.struct("o_orderdate", "o_orderkey")
    return (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(F.min(qual).alias("_q"), F.min(anyo).alias("_a"))
            .select("c_custkey",
                    F.coalesce(F.col("_q.o_orderkey"), F.col("_a.o_orderkey"))
                     .alias("picked_orderkey")))


_PRIORITY_SQL = """
SELECT o_custkey AS c_custkey,
       coalesce(
         min(CASE WHEN o_totalprice >= 200000
                  THEN {'d': o_orderdate, 'k': o_orderkey} END),
         min({'d': o_orderdate, 'k': o_orderkey})
       ).k AS picked_orderkey
FROM orders GROUP BY o_custkey
"""


# --- OP-S3: first-match limit-1 -------------------------------------------
def _first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    return (lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey"))
            .agg(F.min(F.when(F.col("l_quantity") >= 40, F.col("l_linenumber")))
                  .alias("first_heavy_line")))


_FIRST_MATCH_SQL = """
SELECT l_orderkey AS o_orderkey,
       min(CASE WHEN l_quantity >= 40 THEN l_linenumber END) AS first_heavy_line
FROM lineitem GROUP BY l_orderkey
"""


# --- OP-SET1: NOT-IN membership --------------------------------------------
def _not_in_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    poor = (load(spark, sf_dir, "supplier")
            .where(F.col("s_acctbal") < 0)
            .select(F.col("s_suppkey").alias("l_suppkey")))
    return (R.anti_join_deletes(lineitem, poor, ["l_suppkey"])
            .groupBy(F.col("l_suppkey").alias("s_suppkey"))
            .agg(F.count(F.lit(1)).alias("n_items")))


_NOT_IN_SQL = """
SELECT l_suppkey AS s_suppkey, count(*) AS n_items
FROM lineitem
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY l_suppkey
"""


# --- OP-SET2: delete-then-insert replace ------------------------------------
def _replace_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored = click events; batch = purchase events. Users appearing in
    the batch have their rows wholesale-replaced (OP-SET2)."""
    events = load(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "ts"]
    stored = events.where(F.col("event_type") == "click").select(*cols)
    batch = events.where(F.col("event_type") == "purchase").select(*cols)
    return R.replace_by_key(stored, batch, ["user_id"])


_REPLACE_SQL = """
WITH stored AS (SELECT event_id, user_id, event_type, ts FROM events WHERE event_type = 'click'),
     batch  AS (SELECT event_id, user_id, event_type, ts FROM events WHERE event_type = 'purchase')
SELECT * FROM stored WHERE user_id NOT IN (SELECT user_id FROM batch)
UNION ALL
SELECT * FROM batch
"""


# --- OP-SET3: union of multi-source extracts ---------------------------------
def _union_extracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publication-place-from-260∪264∪752 analog: one id set assembled
    from several sources, distinct."""
    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")
    a = (orders.where(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("id")))
    b = (events.where(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("id")))
    return a.unionByName(b).distinct()


_UNION_SQL = """
SELECT DISTINCT id FROM (
  SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT user_id AS id FROM events WHERE event_type = 'signup'
)
"""


# --- salted skew join: must equal the plain join exactly ------------------
def _salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice")
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name")
    joined = R.salted_join(li, sup, "suppkey", salt_buckets=8)
    return (joined.groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("revenue")))


_SALTED_SQL = """
SELECT s.s_name, count(*) AS n_items,
       round(sum(l.l_extendedprice), 2) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


# --- pivot: one aggregation pass, fixed column domain ---------------------
def _pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type counts. The pivot value list is pinned
    (no discovery pass) so the plan is a single groupBy — at scale an
    unpinned pivot costs an extra distinct-collect job on the driver."""
    events = load(spark, sf_dir, "events")
    out = (events.groupBy("user_id")
           .pivot("event_type", list(_EVENT_TYPES)).count())
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                     for t in _EVENT_TYPES])


_PIVOT_SQL = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY user_id
"""


# --- INTERSECT / EXCEPT (absent from the reference; free in Spark) --------
def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys that signed up but never purchased (EXCEPT) and keys that
    did both (INTERSECT), labeled and unioned — the set-algebra surface
    over the same shuffle key."""
    events = load(spark, sf_dir, "events")
    signup = events.where(F.col("event_type") == "signup").select("user_id")
    purchase = events.where(F.col("event_type") == "purchase").select("user_id")
    never = (signup.subtract(purchase)  # EXCEPT DISTINCT semantics
             .select("user_id", F.lit("signup_only").alias("cohort")))
    both = (signup.intersect(purchase)
            .select("user_id", F.lit("signup_and_purchase").alias("cohort")))
    return never.unionByName(both)


_SET_OPS_SQL = """
SELECT user_id, 'signup_only' AS cohort FROM (
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT user_id, 'signup_and_purchase' AS cohort FROM (
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


# ---- full outer reconciliation -------------------------------------------
def _full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation — the one join type the rest of
    the surface doesn't exercise: customers vs event activity on the
    shared key space, classifying every key as both / customer_only /
    events_only. The reconciliation report shape (which master rows
    never saw activity, which activity has no master row) that data
    QA runs after every sync — the reference's ids listings diff the
    same way (ids_from_database.py vs ids_from_files.py).

    Scale: the event side pre-aggregates to one row per key before the
    join (partial-aggregated), so the full-outer shuffle moves two
    key-counted frames, never raw events; AQE picks the join strategy.
    """
    ev = (load(spark, sf_dir, "events")
          .groupBy(F.col("user_id").alias("key"))
          .agg(F.count(F.lit(1)).alias("n_events")))
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"), "c_acctbal")
    j = cust.join(ev, cust.ckey == ev.key, "full_outer")
    presence = (F.when(F.col("ckey").isNotNull() & F.col("key").isNotNull(),
                       "both")
                .when(F.col("ckey").isNotNull(), "customer_only")
                .otherwise("events_only"))
    return j.select(
        F.coalesce("ckey", "key").alias("entity_key"),
        presence.alias("presence"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("c_acctbal"))


_FULL_OUTER_SQL = """
WITH ev AS (
    SELECT user_id AS key, count(*) AS n_events FROM events GROUP BY user_id
),
cust AS (SELECT c_custkey AS ckey, c_acctbal FROM customer)
SELECT coalesce(ckey, key) AS entity_key,
       CASE WHEN ckey IS NOT NULL AND key IS NOT NULL THEN 'both'
            WHEN ckey IS NOT NULL THEN 'customer_only'
            ELSE 'events_only' END AS presence,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       c_acctbal
FROM cust FULL OUTER JOIN ev ON cust.ckey = ev.key
"""


# --- TPC-H Q3 shape: shipping-priority top-N ----------------------------
_Q3_CUTOFF = "1998-06-01"


def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 open orders by pending revenue for one
    market segment — orders placed before the cutoff whose lineitems
    ship after it.

    Scale: the segment filter prunes customer BEFORE its join (column
    + predicate reach the scan); customer⋈orders and orders⋈lineitem
    stay KEYED shuffles — customer is fact-sized (TPC-H 15:1 to
    lineitem), deliberately not broadcast, unlike the true dims in
    ``multiway_join_revenue``. Both date filters push to the parquet
    scans, and the final top-10 is TakeOrdered on the ROUNDED revenue
    (per-partition heaps — no global sort of the aggregate)."""
    cutoff = F.lit(_Q3_CUTOFF).cast("timestamp")
    cust = (load(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


_Q3_SQL = f"""
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q10 shape: returned-item revenue per customer ----------------
_Q10_START, _Q10_END = "1998-01-01", "1998-07-01"


def _returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: top-20 customers by revenue lost to returns
    (l_returnflag = 'R') for orders in one half-year window.

    Scale: return-flag + date predicates push to the scans; the
    order⋈lineitem join is keyed, customer joins keyed on custkey,
    and only nation (25 rows) is broadcast. Top-20 is TakeOrdered."""
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit(_Q10_START).cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit(_Q10_END).cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("lost_revenue"),
                 F.count(F.lit(1)).alias("n_returned_items"),
                 F.round(F.max("c_acctbal"), 2).alias("acctbal"))
            .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
            .limit(20))


_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
           AS lost_revenue,
       count(*) AS n_returned_items,
       round(max(c.c_acctbal), 2) AS acctbal
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{_Q10_START}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_END}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey ASC
LIMIT 20
"""


# --- Market-basket association rules ------------------------------------
_MB_MIN_PAIR = 3
_MB_TOPK = 20


def _market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: top part pairs by
    lift, with support and directional confidence — the co-purchase
    analysis behind "frequently bought together".

    Scale: the pair generator self-joins the DISTINCT (order, part)
    list on the order key, so blow-up is C(basket,2) per order —
    bounded by basket size (~7 in TPC-H), never corpus-quadratic. The
    pair aggregation and the two part-frequency joins are keyed,
    map-side-combinable shuffles (part domain is vocabulary-sized at
    100 TB — no broadcast); lift/support/confidence are exact integer
    rationals rounded once. Top-k is TakeOrdered.
    """
    op = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    part_n = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c"))
    a = op.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("part_b"))
    pairs = (a.join(b, "o").where(F.col("part_a") < F.col("part_b"))
             .groupBy("part_a", "part_b")
             .agg(F.count(F.lit(1)).alias("c_xy"))
             .where(F.col("c_xy") >= _MB_MIN_PAIR))
    return (pairs
            .join(part_n.select(F.col("l_partkey").alias("part_a"),
                                F.col("c").alias("c_x")), "part_a")
            .join(part_n.select(F.col("l_partkey").alias("part_b"),
                                F.col("c").alias("c_y")), "part_b")
            .crossJoin(F.broadcast(n_orders))
            .select("part_a", "part_b", "c_xy", "c_x", "c_y", "n_orders",
                    F.round(F.col("c_xy") / F.col("n_orders"), 6)
                     .alias("support"),
                    F.round(F.col("c_xy") / F.col("c_x"), 6)
                     .alias("confidence_ab"),
                    F.round(F.col("c_xy") * F.col("n_orders")
                            / (F.col("c_x") * F.col("c_y")), 6)
                     .alias("lift"))
            .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
            .limit(_MB_TOPK))


_MB_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
pn AS (SELECT p, count(*) AS c FROM op GROUP BY p),
pairs AS (
    SELECT a.p AS part_a, b.p AS part_b, count(*) AS c_xy
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    GROUP BY a.p, b.p
    HAVING count(*) >= {_MB_MIN_PAIR}
)
SELECT part_a, part_b, c_xy, px.c AS c_x, py.c AS c_y, n_orders,
       round(c_xy / n_orders, 6) AS support,
       round(c_xy / px.c, 6) AS confidence_ab,
       round(c_xy * n_orders / (px.c * py.c), 6) AS lift
FROM pairs
JOIN pn px ON px.p = part_a
JOIN pn py ON py.p = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT {_MB_TOPK}
"""


QUERIES = {
    "market_basket_rules": (_market_basket, _MB_SQL),
    "shipping_priority_topn": (_shipping_priority, _Q3_SQL),
    "returned_item_revenue": (_returned_revenue, _Q10_SQL),
    "broadcast_dim_lookup": (_broadcast_lookup, _BROADCAST_LOOKUP_SQL),
    "salted_skew_join": (_salted_skew_join, _SALTED_SQL),
    "pivot_event_counts": (_pivot_event_counts, _PIVOT_SQL),
    "set_intersect_except": (_set_ops, _SET_OPS_SQL),
    "anti_join_deletes": (_anti_join_deletes, _ANTI_JOIN_SQL),
    "semi_join_exists": (_semi_join, _SEMI_JOIN_SQL),
    "self_join_edges": (_self_join_edges, _SELF_JOIN_SQL),
    "multiway_join_revenue": (_multiway_revenue, _MULTIWAY_SQL),
    "last_writer_wins": (_last_writer_wins, _LWW_SQL),
    "first_per_group": (_first_per_group, _FIRST_SQL),
    "adjacent_change_detect": (_changed_rows, _CHANGED_SQL),
    "max_per_group": (_max_per_group, _MAX_SQL),
    "distinct_collect_set": (_distinct_collect, _DISTINCT_COLLECT_SQL),
    "collect_list_per_group": (_collect_group, _COLLECT_SQL),
    "group_size_assertion": (_group_size_check, _GROUP_SIZE_SQL),
    "priority_select": (_priority_select, _PRIORITY_SQL),
    "first_match_limit1": (_first_match, _FIRST_MATCH_SQL),
    "not_in_membership": (_not_in_membership, _NOT_IN_SQL),
    "replace_by_key": (_replace_by_key, _REPLACE_SQL),
    "union_multi_extract": (_union_extracts, _UNION_SQL),
    "full_outer_reconcile": (_full_outer_reconcile, _FULL_OUTER_SQL),
}


# --- Spatial neighbor join (grid-cell blocking) --------------------------
GEO_EPS_MICRO = 2_000_000           # 2.0 degrees, in micro-degrees
GEO_CELL_MICRO = 2_000_000          # cell edge == eps -> 3x3 probe covers


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic coordinates per customer (the driver
    schema has no geo columns): lat/lon derived from md5 of the key —
    identical in the oracle, uniform over the globe."""
    from .sketches import _h48

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    lat = (F.pmod(_h48(F.col("c_custkey").cast("string"), "lat:"),
                  F.lit(180_000_000)) - 90_000_000)
    lon = (F.pmod(_h48(F.col("c_custkey").cast("string"), "lon:"),
                  F.lit(360_000_000)) - 180_000_000)
    return cust.select(F.col("c_custkey").alias("pid"),
                       lat.alias("lat_u"), lon.alias("lon_u"))


def _geo_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join: all point pairs within ε=2° (flat-earth
    micro-degree metric), blocked by an ε-sized grid — the standard
    distributed spatial-join shape (the degenerate cousin of every
    geohash/H3/S2 join): each point lands in one cell, the probe side
    explodes to its 3×3 cell neighborhood, so every true pair shares
    an equi key and the residual exact distance runs on candidates
    only.

    Determinism: coordinates, cells and squared distances are exact
    int64 micro-degrees (the distance emits one rounded sqrt).
    Scale: candidate count is Σ_cells occupancy² over the 3×3
    neighborhood — density-bound per cell, never corpus-quadratic;
    the join is one hash shuffle on the cell key. Skewed cells (urban
    clusters at 100 TB) get AQE skew-split; the grid constant trades
    replication (9×) against candidate selectivity exactly like the
    length-bucket blocking in ``levenshtein_neardup``.
    """
    pts = _geo_points(spark, sf_dir)
    cellx = F.expr(f"(lon_u + 180000000) div {GEO_CELL_MICRO}")
    celly = F.expr(f"(lat_u + 90000000) div {GEO_CELL_MICRO}")
    based = pts.select("pid", "lat_u", "lon_u",
                       cellx.alias("cx"), celly.alias("cy"))
    probe = (based.select(
        "pid", "lat_u", "lon_u",
        F.explode(F.array(*[F.struct((F.col("cx") + dx).alias("cx"),
                                     (F.col("cy") + dy).alias("cy"))
                            for dx in (-1, 0, 1)
                            for dy in (-1, 0, 1)])).alias("c"))
        .select("pid", "lat_u", "lon_u",
                F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy")))
    a = probe.select(F.col("pid").alias("pid_a"),
                     F.col("lat_u").alias("lat_a"),
                     F.col("lon_u").alias("lon_a"), "cx", "cy")
    b = based.select(F.col("pid").alias("pid_b"),
                     F.col("lat_u").alias("lat_b"),
                     F.col("lon_u").alias("lon_b"), "cx", "cy")
    d2 = ((F.col("lat_a") - F.col("lat_b"))
          * (F.col("lat_a") - F.col("lat_b"))
          + (F.col("lon_a") - F.col("lon_b"))
          * (F.col("lon_a") - F.col("lon_b")))
    return (a.join(b, ["cx", "cy"])
            .where(F.col("pid_a") < F.col("pid_b"))
            .select("pid_a", "pid_b", d2.alias("d2"))
            .where(F.col("d2") <= GEO_EPS_MICRO * GEO_EPS_MICRO)
            .distinct()
            .select("pid_a", "pid_b",
                    F.round(F.sqrt(F.col("d2").cast("double")) / 1e6, 4)
                     .alias("dist_deg")))


def _geo_sql() -> str:
    def h(salt):
        return (f"CAST('0x' || substr(md5('{salt}' ||"
                f" CAST(c_custkey AS VARCHAR)), 1, 12) AS BIGINT)")

    cells = " UNION ALL ".join(
        f"SELECT pid, lat_u, lon_u, cx + {dx} AS cx, cy + {dy} AS cy"
        " FROM based"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
WITH pts AS (
    SELECT c_custkey AS pid,
           {h('lat:')} % 180000000 - 90000000 AS lat_u,
           {h('lon:')} % 360000000 - 180000000 AS lon_u
    FROM customer
),
based AS (
    SELECT pid, lat_u, lon_u,
           (lon_u + 180000000) // {GEO_CELL_MICRO} AS cx,
           (lat_u + 90000000) // {GEO_CELL_MICRO} AS cy
    FROM pts
),
probe AS ({cells}),
cand AS (
    SELECT DISTINCT a.pid AS pid_a, b.pid AS pid_b,
           (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
           + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS d2
    FROM probe a
    JOIN based b ON a.cx = b.cx AND a.cy = b.cy AND a.pid < b.pid
)
SELECT pid_a, pid_b, round(sqrt(CAST(d2 AS DOUBLE)) / 1e6, 4) AS dist_deg
FROM cand WHERE d2 <= {GEO_EPS_MICRO * GEO_EPS_MICRO}
"""


QUERIES["geo_neighbor_join"] = (_geo_neighbor_join, _geo_sql())


# --- TPC-H Q1 shape: pricing summary report ------------------------------
_Q1_CUTOFF = "2001-09-01"


def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical one-pass
    aggregate (6 sums/avgs + count per (returnflag, linestatus)) with
    the shipdate cutoff pushed to the scan. The whole query is one
    map-side-combinable aggregation after a filtered scan — the shape
    every columnar engine benchmarks first; registry #200."""
    cutoff = F.lit(_Q1_CUTOFF).cast("timestamp")
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") <= cutoff))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""

QUERIES["pricing_summary_report"] = (_pricing_summary, _Q1_SQL)


# ---------------------------------------------------------------------------
# Apriori round 2→3: frequent triples from frequent-pair candidates
# ---------------------------------------------------------------------------
_AP_MIN_PAIR = 2    # pair support floor (round-2 frequent set)
_AP_MIN_TRIPLE = 1  # triple support floor (report all pruned survivors)


def _apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Apriori candidate-generation round: frequent 3-itemsets in
    order baskets, pruned by the round-2 frequent-pair set before
    counting (the antimonotonicity step that makes Apriori tractable —
    a triple only counts if ALL THREE of its pairs are frequent).

    Scale: triples enumerate per order (baskets are ≤ ~dozen items, so
    C(b,3) is bounded per row — linear in orders); the pair-support
    prune broadcasts the round-2 set as three semi-joins BEFORE the
    triple aggregate, so infrequent combinations never shuffle. This
    is the general L_k → C_{k+1} template — higher rounds repeat the
    same join shape.

    Cites market_basket_rules (same basket relation) — this query adds
    the candidate-pruning round structure.
    """
    baskets = (load(spark, sf_dir, "lineitem")
               .select("l_orderkey", "l_partkey")
               .repartition("l_orderkey")
               .dropDuplicates(["l_orderkey", "l_partkey"]))

    def side(name):
        return baskets.select(F.col("l_orderkey").alias("ok"),
                              F.col("l_partkey").alias(name))

    pairs = (side("i").join(side("j"), "ok")
             .where(F.col("i") < F.col("j"))
             .groupBy("i", "j").agg(F.count(F.lit(1)).alias("c"))
             .where(F.col("c") >= _AP_MIN_PAIR)
             .select("i", "j"))
    triples = (side("a").join(side("b"), "ok")
               .where(F.col("a") < F.col("b"))
               .join(side("d"), "ok")
               .where(F.col("b") < F.col("d")))
    fp = F.broadcast(pairs)
    pruned = (triples
              .join(fp, (triples.a == pairs.i) & (triples.b == pairs.j),
                    "left_semi")
              .join(fp, (triples.a == pairs.i) & (triples.d == pairs.j),
                    "left_semi")
              .join(fp, (triples.b == pairs.i) & (triples.d == pairs.j),
                    "left_semi"))
    return (pruned.groupBy("a", "b", "d")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= _AP_MIN_TRIPLE)
            .select(F.col("a").alias("item_a"), F.col("b").alias("item_b"),
                    F.col("d").alias("item_c"), "support"))


_APRIORI_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), fpairs AS (
  SELECT a.pk AS i, b.pk AS j
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING count(*) >= {_AP_MIN_PAIR}
), triples AS (
  SELECT a.ok, a.pk AS ta, b.pk AS tb, d.pk AS td
  FROM baskets a
  JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
  JOIN baskets d ON a.ok = d.ok AND b.pk < d.pk
)
SELECT t.ta AS item_a, t.tb AS item_b, t.td AS item_c,
       CAST(count(*) AS BIGINT) AS support
FROM triples t
WHERE EXISTS (SELECT 1 FROM fpairs p WHERE p.i = t.ta AND p.j = t.tb)
  AND EXISTS (SELECT 1 FROM fpairs p WHERE p.i = t.ta AND p.j = t.td)
  AND EXISTS (SELECT 1 FROM fpairs p WHERE p.i = t.tb AND p.j = t.td)
GROUP BY 1, 2, 3
HAVING count(*) >= {_AP_MIN_TRIPLE}
"""

QUERIES["apriori_triples"] = (_apriori_triples, _APRIORI_SQL)
