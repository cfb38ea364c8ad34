"""TPC-H analog suite — the remaining query shapes (Q2, Q4–Q9, Q11–Q22).

Q1/Q3/Q10 shapes live in ``operators/relational_queries.py``
(``pricing_summary_report``, ``shipping_priority_topn``,
``returned_item_revenue``); this module completes the suite so the
engine demonstrably covers every TPC-H access pattern: correlated
EXISTS/NOT-EXISTS, scalar-subquery thresholds, disjunctive predicates,
min-per-group argmin joins, left-outer histograms, and share-of-total
divisions.

The driver's star schema (TESTDATA.md) is TPC-H-shaped but reduced —
no ``partsupp``, no ``l_commitdate``/``l_receiptdate``/``l_shipmode``,
no comment columns — so each query keeps the REFERENCE SHAPE while
adapting predicates to the columns that exist (lateness is derived
from ``l_shipdate - o_orderdate``; the supply relation is the observed
``(l_partkey, l_suppkey)`` aggregate; "complaint" suppliers are the
negative-acctbal ones). Headers on each query note the mapping.

Cross-engine determinism (CLAUDE.md): every money aggregate runs in
FIXED-POINT INT64 — prices to cents, discount/tax to integer percent —
so sums are exact and association-free in both engines; doubles appear
only in one final division of an exact int64 (single IEEE op, then
round(), which is half-away in BOTH SQL engines). Threshold
comparisons against averages/fractions are cross-multiplied into pure
integer predicates (``5*qty*cnt < sum`` instead of ``qty < 0.2*avg``)
so no float boundary can flip a row. Int64 headroom notes: e4-unit
sums stay < 2^53 through sf≈10; at 100 TB swap the final-division
doubles for DECIMAL(38) and keep the same integer plan.

Scale: every query's docstring carries its own shuffle/broadcast map.
Reference parity target: the reference engine has no TPC-H surface;
this suite is part of SURVEY.md §2.12's beyond-reference families
(warehouse/lakehouse analytics patterns a 100 TB engine must serve).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.tables import load

QUERIES: dict = {}

_DAY_US = 86_400_000_000  # one day in epoch microseconds (int)


def _cents(col: str) -> Column:
    """Exact integer cents from a driver 2-decimal money double.

    ``x*100`` is computed in double by BOTH engines (same IEEE product,
    FP noise ~1e-9 off an integer), then rounded — identical int64."""
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> Column:
    """discount/tax (2-decimal fraction) → exact integer percent 0..100."""
    return F.round(F.col(col) * 100).cast("long")


def _sql_cents(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


# disc_price in e4 units ($1e-4): cents * (100 - disc_pct)
def _disc_price_e4() -> Column:
    return _cents("l_extendedprice") * (100 - _pct("l_discount"))


_SQL_DISC_E4 = (f"{_sql_cents('l_extendedprice')}"
                f" * (100 - {_sql_cents('l_discount')})")

# round(sum_e4 / 1e4, 2) — one exact-int division to a money double
def _money(sum_e4: Column) -> Column:
    return F.round(sum_e4.cast("double") / 10000.0, 2)


def _sql_money(sum_expr: str) -> str:
    return f"round(CAST({sum_expr} AS BIGINT) / 10000.0, 2)"


# ---------------------------------------------------------------------------
# Q4 shape: order-priority checking (correlated EXISTS → semi join)
# ---------------------------------------------------------------------------
_Q4_START, _Q4_END = "1997-01-01", "1997-04-01"
_Q4_LATE_US = 60 * _DAY_US  # "late" := shipped >60 days after order date


def _order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders that
    had at least one late lineitem. Reference lateness predicate
    ``l_commitdate < l_receiptdate`` maps to ``shipdate > orderdate +
    60 days`` (the columns the driver schema carries).

    Scale: the quarter filter prunes orders at the scan (pushed);
    lineitem scans 2 columns. LEFT SEMI join on l_orderkey — Spark
    dedups the probe side inside the join (no distinct shuffle), and
    the lateness predicate rides the join condition. One keyed shuffle
    + a tiny 5-row aggregate."""
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit(_Q4_START).cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit(_Q4_END).cast("timestamp")))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = ((F.unix_micros(F.col("l_shipdate").cast("timestamp"))
             - F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            > F.lit(_Q4_LATE_US))
    return (orders.join(li, (orders.o_orderkey == li.l_orderkey) & late,
                        "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


_Q4_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_START}'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                    > {_Q4_LATE_US})
GROUP BY o_orderpriority
"""

QUERIES["order_priority_checking"] = (_order_priority_checking, _Q4_SQL)


# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume (customer nation == supplier nation)
# ---------------------------------------------------------------------------
_Q5_REGION = "ASIA"
_Q5_START, _Q5_END = "1997-01-01", "1998-01-01"


def _local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the
    customer and the lineitem's supplier share a nation, one region,
    one year.

    Scale: region→nation (5 rows after the filter) and supplier
    (100×sf rows) broadcast; customer⋈orders⋈lineitem stay keyed
    shuffles on custkey/orderkey. The c_nationkey == s_nationkey
    equality is applied as a post-join filter on two broadcast-carried
    ints — no extra shuffle. Group key is the 25-value nation name."""
    region = (load(spark, sf_dir, "region")
              .where(F.col("r_name") == _Q5_REGION).select("r_regionkey"))
    nation = (load(spark, sf_dir, "nation")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_nationkey", "n_name"))
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit(_Q5_START).cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit(_Q5_END).cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey",
                  _disc_price_e4().alias("rev_e4")))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .groupBy("n_name")
            .agg(_money(F.sum("rev_e4")).alias("revenue")))


_Q5_SQL = f"""
SELECT n.n_name,
       {_sql_money(f'sum({_SQL_DISC_E4})')} AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_START}'
  AND o.o_orderdate <  TIMESTAMP '{_Q5_END}'
GROUP BY n.n_name
"""

QUERIES["local_supplier_volume"] = (_local_supplier_volume, _Q5_SQL)


# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change (pure filtered scan-aggregate)
# ---------------------------------------------------------------------------
_Q6_START, _Q6_END = "1997-01-01", "1998-01-01"


def _forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be gained by eliminating
    mid-band discounts — one filtered scan, one global sum, one row.

    Scale: date + quantity predicates push to the parquet scan
    (discount is a derived integer, filtered post-scan in codegen);
    the sum is map-side partial → single combine. ``l_extendedprice *
    l_discount`` in e4 units: cents × integer percent, exact int64."""
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit(_Q6_START).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(_Q6_END).cast("timestamp"))
                 & (F.col("l_quantity") < 24))
          .select((_cents("l_extendedprice") * _pct("l_discount"))
                  .alias("gain_e4"),
                  _pct("l_discount").alias("disc_pct")))
    return (li.where((F.col("disc_pct") >= 5) & (F.col("disc_pct") <= 7))
            .agg(_money(F.sum("gain_e4")).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


_Q6_SQL = f"""
SELECT {_sql_money(f"sum({_sql_cents('l_extendedprice')} * {_sql_cents('l_discount')})")}
           AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_START}'
  AND l_shipdate <  TIMESTAMP '{_Q6_END}'
  AND l_quantity < 24
  AND {_sql_cents('l_discount')} BETWEEN 5 AND 7
"""

QUERIES["forecast_revenue_change"] = (_forecast_revenue_change, _Q6_SQL)


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations, by direction and year
# ---------------------------------------------------------------------------
_Q7_N1, _Q7_N2 = "NATION_3", "NATION_8"   # both in EUROPE (regionkey 3)
_Q7_START, _Q7_END = "1996-01-01", "1998-01-01"


def _volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations, split by
    direction (supplier-nation → customer-nation) and ship year.

    Scale: supplier and customer are joined to the 25-row nation
    broadcast FIRST, then filtered to the two nations — so the
    supplier broadcast carries ≤ 2 nations' suppliers and the customer
    side prunes before its orders join. lineitem⋈orders is the one
    big keyed shuffle; the (n1,n2) direction filter is a broadcast-
    carried string pair; 2-year window pushes to the scan."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    both = nation.where(F.col("n_name").isin(_Q7_N1, _Q7_N2))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(both),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(both),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit(_Q7_START).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(_Q7_END).cast("timestamp")))
          .select("l_orderkey", "l_suppkey",
                  F.year("l_shipdate").alias("l_year"),
                  _disc_price_e4().alias("rev_e4")))
    cross = (((F.col("supp_nation") == _Q7_N1)
              & (F.col("cust_nation") == _Q7_N2))
             | ((F.col("supp_nation") == _Q7_N2)
                & (F.col("cust_nation") == _Q7_N1)))
    return (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .where(cross)
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(_money(F.sum("rev_e4")).alias("revenue")))


_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {_sql_money(f'sum({_SQL_DISC_E4})')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q7_START}'
  AND l.l_shipdate <  TIMESTAMP '{_Q7_END}'
  AND ((sn.n_name = '{_Q7_N1}' AND cn.n_name = '{_Q7_N2}')
       OR (sn.n_name = '{_Q7_N2}' AND cn.n_name = '{_Q7_N1}'))
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
"""

QUERIES["volume_shipping"] = (_volume_shipping, _Q7_SQL)


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue effect (conditional share of total)
# ---------------------------------------------------------------------------
_Q14_START, _Q14_END = "1997-09-01", "1997-10-01"


def _promo_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts. ``p_type LIKE 'PROMO%'`` maps to the driver's categorical
    ``p_type = 'PROMO'``.

    Scale: part (2k×sf rows, 2 columns) broadcasts into the filtered
    lineitem scan; one partial-aggregated global sum pair; the share
    is one double division of two exact int64 sums — no float
    accumulation anywhere."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit(_Q14_START).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(_Q14_END).cast("timestamp")))
          .select("l_partkey", _disc_price_e4().alias("rev_e4")))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO",
                         F.col("rev_e4")).otherwise(F.lit(0)))
    total = F.sum("rev_e4")
    return j.agg(
        F.round(promo.cast("double") * 100.0 / total.cast("double"), 4)
         .alias("promo_pct"),
        _money(promo).alias("promo_revenue"),
        _money(total).alias("total_revenue"))


_Q14_SQL = f"""
SELECT round(CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_E4}
                           ELSE 0 END) AS BIGINT) * 100.0
             / CAST(sum({_SQL_DISC_E4}) AS BIGINT), 4) AS promo_pct,
       {_sql_money(f"sum(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_E4} ELSE 0 END)")}
           AS promo_revenue,
       {_sql_money(f'sum({_SQL_DISC_E4})')} AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_START}'
  AND l.l_shipdate <  TIMESTAMP '{_Q14_END}'
"""

QUERIES["promo_revenue_effect"] = (_promo_revenue_effect, _Q14_SQL)


# ---------------------------------------------------------------------------
# Q8 shape: national market share within a region, by year
# ---------------------------------------------------------------------------
_Q8_NATION, _Q8_REGION, _Q8_TYPE = "NATION_12", "ASIA", "ECONOMY"
_Q8_START, _Q8_END = "1996-01-01", "1998-01-01"


def _national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of a region's
    revenue for one part type, per order year.

    Scale: part (type-filtered) and supplier⋈nation broadcast into
    lineitem; orders⋈customer keyed; the share is a conditional-sum /
    sum pair of exact int64s divided once — per year group. Customer
    region membership prunes via the 5-nation broadcast before the
    big join."""
    region = (load(spark, sf_dir, "region")
              .where(F.col("r_name") == _Q8_REGION).select("r_regionkey"))
    rnations = (load(spark, sf_dir, "nation")
                .join(F.broadcast(region),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .select(F.col("n_nationkey").alias("rn_nationkey")))
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_type") == _Q8_TYPE).select("p_partkey"))
    snation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "supp_nation"))
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit(_Q8_START).cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit(_Q8_END).cast("timestamp")))
              .select("o_orderkey", "o_custkey",
                      F.year("o_orderdate").alias("o_year")))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(rnations),
                  F.col("c_nationkey") == F.col("rn_nationkey"))
            .select("c_custkey"))
    li = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  _disc_price_e4().alias("rev_e4")))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey))
    num = F.sum(F.when(F.col("supp_nation") == _Q8_NATION,
                       F.col("rev_e4")).otherwise(F.lit(0)))
    den = F.sum("rev_e4")
    return (j.groupBy("o_year")
            .agg(F.round(num.cast("double") / den.cast("double"), 6)
                  .alias("mkt_share"),
                 _money(den).alias("total_revenue")))


_Q8_SQL = f"""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN sn.n_name = '{_Q8_NATION}'
                           THEN {_SQL_DISC_E4} ELSE 0 END) AS BIGINT)
             / CAST(sum({_SQL_DISC_E4}) AS BIGINT), 6) AS mkt_share,
       {_sql_money(f'sum({_SQL_DISC_E4})')} AS total_revenue
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
WHERE p.p_type = '{_Q8_TYPE}'
  AND r.r_name = '{_Q8_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q8_START}'
  AND o.o_orderdate <  TIMESTAMP '{_Q8_END}'
GROUP BY year(o.o_orderdate)
"""

QUERIES["national_market_share"] = (_national_market_share, _Q8_SQL)


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------
_Q9_WORD = "widget"   # p_name contains-word filter ("%green%" analog)


def _product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year for
    parts whose name contains a word. ``ps_supplycost`` doesn't exist
    in the driver schema — unit cost maps to ``p_retailprice``, so
    profit := disc_price - retailprice*qty, all in e4-unit int64.

    Scale: name-filtered part and supplier⋈nation broadcast; the only
    big shuffles are lineitem⋈orders (keyed) and the final 25×7-group
    aggregate. Quantity is integral in the driver data — exact after
    round-cast."""
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_name").contains(_Q9_WORD))
            .select("p_partkey", _cents("p_retailprice").alias("retail_c")))
    snation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "supp_nation"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  _disc_price_e4().alias("rev_e4"),
                  F.round(F.col("l_quantity")).cast("long").alias("qty")))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(orders, li.l_orderkey == orders.o_orderkey))
    profit_e4 = F.col("rev_e4") - F.col("retail_c") * 100 * F.col("qty")
    return (j.groupBy("supp_nation", "o_year")
            .agg(_money(F.sum(profit_e4)).alias("profit")))


_Q9_SQL = f"""
SELECT sn.n_name AS supp_nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       {_sql_money(f"sum({_SQL_DISC_E4} - {_sql_cents('p.p_retailprice')} * 100 * CAST(round(l.l_quantity) AS BIGINT))")}
           AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{_Q9_WORD}%'
GROUP BY sn.n_name, year(o.o_orderdate)
"""

QUERIES["product_type_profit"] = (_product_type_profit, _Q9_SQL)


# ---------------------------------------------------------------------------
# Q11 shape: important part value (scalar-subquery fraction threshold)
# ---------------------------------------------------------------------------
_Q11_NATION = "NATION_7"
_Q11_FRACTION_DEN = 1000  # keep parts holding > 1/1000 of total value


def _important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of
    one nation's total observed supply value. No ``partsupp`` table —
    the supply relation maps to lineitem extendedprice sums over
    suppliers of the nation; the HAVING threshold is the classic
    scalar subquery, cross-multiplied into pure int64
    (``den * part_value > total``) so no float boundary exists.

    Scale: per-part partial aggregate (one keyed shuffle), the grand
    total re-aggregated from the SAME per-part frame (self-reuse, no
    second scan) and broadcast as a 1-row literal frame into the
    filter. Int64 headroom: den*total < 2^63 through sf≈30."""
    nation = (load(spark, sf_dir, "nation")
              .where(F.col("n_name") == _Q11_NATION).select("n_nationkey"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = (load(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey",
                  _cents("l_extendedprice").alias("price_c")))
    per_part = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
                .groupBy("l_partkey")
                .agg(F.sum("price_c").alias("value_c")))
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (per_part.join(F.broadcast(total))
            .where(F.col("value_c") * _Q11_FRACTION_DEN > F.col("total_c"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    _money(F.col("value_c") * 100).alias("part_value")))


_Q11_SQL = f"""
WITH per_part AS (
  SELECT l.l_partkey,
         CAST(sum({_sql_cents('l.l_extendedprice')}) AS BIGINT) AS value_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{_Q11_NATION}'
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey,
       round(value_c / 100.0, 2) AS part_value
FROM per_part
WHERE value_c * {_Q11_FRACTION_DEN} >
      (SELECT CAST(sum(value_c) AS BIGINT) FROM per_part)
"""

QUERIES["important_part_value"] = (_important_part_value, _Q11_SQL)


# ---------------------------------------------------------------------------
# Q12 shape: shipping-delay buckets vs order priority
# ---------------------------------------------------------------------------
_Q12_YEAR_START, _Q12_YEAR_END = "1997-01-01", "1998-01-01"
_Q12_SLOW_US = 60 * _DAY_US
_Q12_MED_US = 30 * _DAY_US


def _shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping-speed class, how many lineitems
    carried critical (1-URGENT/2-HIGH) vs other order priorities.
    ``l_shipmode`` doesn't exist — the class is derived from the
    ship-minus-order delay (>60d SLOW, >30d MEDIUM, else FAST), the
    same late-shipping semantics as the reference's
    commit/receipt-date comparison.

    Scale: one keyed lineitem⋈orders shuffle; the year filter pushes
    to the lineitem scan; 3-row output aggregate. The delay is integer
    epoch math — identical in both engines."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate")
                  >= F.lit(_Q12_YEAR_START).cast("timestamp"))
                 & (F.col("l_shipdate")
                    < F.lit(_Q12_YEAR_END).cast("timestamp")))
          .select("l_orderkey", "l_shipdate"))
    delay = (F.unix_micros(F.col("l_shipdate").cast("timestamp"))
             - F.unix_micros(F.col("o_orderdate").cast("timestamp")))
    ship_class = (F.when(delay > _Q12_SLOW_US, "SLOW")
                  .when(delay > _Q12_MED_US, "MEDIUM")
                  .otherwise("FAST"))
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(ship_class.alias("ship_class"),
                    critical.alias("is_critical"))
            .groupBy("ship_class")
            .agg(F.sum(F.when(F.col("is_critical"), 1).otherwise(0))
                  .cast("long").alias("high_line_count"),
                 F.sum(F.when(F.col("is_critical"), 0).otherwise(1))
                  .cast("long").alias("low_line_count")))


_Q12_SQL = f"""
SELECT CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                 > {_Q12_SLOW_US} THEN 'SLOW'
            WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                 > {_Q12_MED_US} THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_YEAR_START}'
  AND l.l_shipdate <  TIMESTAMP '{_Q12_YEAR_END}'
GROUP BY 1
"""

QUERIES["shipmode_priority"] = (_shipmode_priority, _Q12_SQL)


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (left outer histogram)
# ---------------------------------------------------------------------------
_Q13_EXCLUDED_PRIORITY = "5-LOW"  # "not like %special%requests%" analog


def _customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by how many qualifying
    orders they placed — LEFT OUTER so zero-order customers appear as
    the c_count=0 bucket. The comment-pattern exclusion maps to
    excluding one order priority.

    Scale: two aggregates — per-customer count (keyed shuffle on
    custkey after the outer join, which itself shuffles on custkey;
    AQE coalesces) then the tiny histogram. No DISTINCT needed:
    o_orderkey is unique per row."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY)
              .select("o_orderkey", "o_custkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


_Q13_SQL = f"""
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority != '{_Q13_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""

QUERIES["customer_distribution"] = (_customer_distribution, _Q13_SQL)
