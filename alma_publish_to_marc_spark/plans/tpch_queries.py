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

# e4 units → money double, with the half-up decision made in EXACT
# integer space: floor((x+50)/100) cents, then one exact cents/100.0
# division. round(x/1e4, 2) would land on a true .xx5 midpoint whenever
# sum_e4 ≡ 50 (mod 100) — ~1% of cells — where Spark (BigDecimal of the
# double's exact expansion) and DuckDB (libm path) disagree; the floor
# form gives both engines the identical integer. Negatives round half
# toward +inf in both (floor semantics).
def _money(sum_e4: Column) -> Column:
    half_up_cents = F.floor((sum_e4.cast("double") + 50.0) / 100.0)
    return half_up_cents.cast("double") / 100.0


def _sql_money(sum_expr: str) -> str:
    return (f"CAST(floor((CAST({sum_expr} AS BIGINT) + 50) / 100.0)"
            f" AS BIGINT) / 100.0")


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
                    (F.col("value_c").cast("double") / 100.0)
                     .alias("part_value")))


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
       value_c / 100.0 AS part_value
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


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part (argmin join)
# ---------------------------------------------------------------------------
_Q2_SIZE, _Q2_TYPE, _Q2_REGION = 15, "STANDARD", "EUROPE"


def _min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region's supplier
    offering it at minimum cost. No ``partsupp`` — the supply cost
    maps to the minimum observed ``l_extendedprice`` (cents) per
    (part, supplier). The correlated MIN subquery becomes a
    struct-min argmin (CLAUDE.md: ties break on the id INSIDE the
    struct — min_by/arg_min tie order is undefined cross-engine).

    Scale: region suppliers and filtered parts broadcast; the only
    big shuffle is the (part,supp) aggregate of lineitem, reused for
    both the argmin and the detail join (self-contained plan, no
    second lineitem scan). Top-100 is TakeOrdered."""
    region = (load(spark, sf_dir, "region")
              .where(F.col("r_name") == _Q2_REGION).select("r_regionkey"))
    nation = (load(spark, sf_dir, "nation")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    part = (load(spark, sf_dir, "part")
            .where((F.col("p_size") == _Q2_SIZE)
                   & (F.col("p_type") == _Q2_TYPE))
            .select("p_partkey"))
    li = (load(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey",
                  _cents("l_extendedprice").alias("price_c")))
    offers = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .join(F.broadcast(supp.select("s_suppkey")),
                    li.l_suppkey == F.col("s_suppkey"))
              .groupBy("p_partkey", "l_suppkey")
              .agg(F.min("price_c").alias("cost_c")))
    best = (offers.groupBy("p_partkey")
            .agg(F.min(F.struct(F.col("cost_c"), F.col("l_suppkey")))
                  .alias("m"))
            .select("p_partkey", F.col("m.cost_c").alias("cost_c"),
                    F.col("m.l_suppkey").alias("best_suppkey")))
    return (best.join(F.broadcast(supp),
                      best.best_suppkey == supp.s_suppkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    (F.col("cost_c").cast("double") / 100.0).alias("supply_cost"))
            .orderBy(F.desc("s_acctbal"), F.asc("s_name"),
                     F.asc("p_partkey"))
            .limit(100))


_Q2_SQL = f"""
WITH rsupp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q2_REGION}'
), offers AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         CAST(min({_sql_cents('l.l_extendedprice')}) AS BIGINT) AS cost_c
  FROM lineitem l
  JOIN part p  ON l.l_partkey = p.p_partkey
  JOIN rsupp s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_size = {_Q2_SIZE} AND p.p_type = '{_Q2_TYPE}'
  GROUP BY l.l_partkey, l.l_suppkey
), best AS (
  SELECT p_partkey,
         min(struct_pack(cost_c := cost_c, sk := l_suppkey)) AS m
  FROM offers GROUP BY p_partkey
)
SELECT s.s_acctbal, s.s_name, s.n_name, b.p_partkey,
       m.cost_c / 100.0 AS supply_cost
FROM best b
JOIN rsupp s ON b.m.sk = s.s_suppkey
ORDER BY s.s_acctbal DESC, s.s_name ASC, b.p_partkey ASC
LIMIT 100
"""

QUERIES["min_cost_supplier"] = (_min_cost_supplier, _Q2_SQL)


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue (max scalar subquery)
# ---------------------------------------------------------------------------
_Q15_START, _Q15_END = "1997-01-01", "1997-04-01"


def _top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum — the reference's revenue VIEW + scalar MAX subquery.
    Equality against the max is safe: revenue is exact int64 e4 units
    (a float-summed revenue could tie-break differently per engine).

    Scale: one keyed per-supplier aggregate of the date-filtered scan;
    the max re-aggregates the SAME tiny frame and broadcasts as a
    1-row cross join; supplier names broadcast in last (only matching
    rows pay the lookup)."""
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp")))
          .select("l_suppkey", _disc_price_e4().alias("rev_e4")))
    rev = li.groupBy("l_suppkey").agg(F.sum("rev_e4").alias("total_e4"))
    mx = rev.agg(F.max("total_e4").alias("max_e4"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.join(F.broadcast(mx))
            .where(F.col("total_e4") == F.col("max_e4"))
            .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
            .select(F.col("s_suppkey"), F.col("s_name"),
                    _money(F.col("total_e4")).alias("total_revenue")))


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum({_SQL_DISC_E4}) AS BIGINT) AS total_e4
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '{_Q15_START}'
    AND l.l_shipdate <  TIMESTAMP '{_Q15_END}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(floor((r.total_e4 + 50) / 100.0) AS BIGINT) / 100.0
           AS total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_e4 = (SELECT max(total_e4) FROM rev)
"""

QUERIES["top_supplier_revenue"] = (_top_supplier_revenue, _Q15_SQL)


# ---------------------------------------------------------------------------
# Q16 shape: parts/supplier relationship (anti join + count distinct)
# ---------------------------------------------------------------------------
_Q16_BAD_BRAND, _Q16_BAD_TYPE = "Brand#3", "PROMO"
_Q16_SIZES = (1, 14, 23, 45)


def _parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) for qualifying parts, EXCLUDING flagged suppliers. The
    "customer complaints" comment pattern maps to negative-acctbal
    suppliers; the supply relation is the observed lineitem pairs.

    Scale: filtered part and the tiny flagged-supplier list broadcast
    (the exclusion is a broadcast ANTI join — no shuffle); distinct
    (brand,type,size,supp) pairs reduce map-side before the
    count-distinct aggregate's one keyed shuffle."""
    part = (load(spark, sf_dir, "part")
            .where((F.col("p_brand") != _Q16_BAD_BRAND)
                   & (F.col("p_type") != _Q16_BAD_TYPE)
                   & (F.col("p_size").isin(*_Q16_SIZES)))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad_supp = (load(spark, sf_dir, "supplier")
                .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(bad_supp),
                  li.l_suppkey == bad_supp.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand != '{_Q16_BAD_BRAND}'
  AND p.p_type  != '{_Q16_BAD_TYPE}'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

QUERIES["parts_supplier_relationship"] = (_parts_supplier_relationship,
                                          _Q16_SQL)


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (correlated AVG threshold)
# ---------------------------------------------------------------------------
_Q17_BRAND, _Q17_MAX_SIZE = "Brand#5", 10


def _small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not filled.
    The correlated ``0.2 * avg(l_quantity)`` becomes the pure-integer
    cross-multiplication ``5 * qty * cnt < sum_qty`` — no float
    boundary can flip a lineitem between engines. The /7.0 divisor is
    the driver data's exact 7 order years (1995–2001).

    Scale: the brand/size part filter broadcasts twice (base join +
    per-part stats join — both map-side); the per-part stats frame is
    itself broadcast back, so the whole query runs with NO keyed
    shuffle of lineitem, only its partial aggregate."""
    part = (load(spark, sf_dir, "part")
            .where((F.col("p_brand") == _Q17_BRAND)
                   & (F.col("p_size") < _Q17_MAX_SIZE))
            .select("p_partkey"))
    li = (load(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  F.round(F.col("l_quantity")).cast("long").alias("qty"),
                  _cents("l_extendedprice").alias("price_c")))
    base = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    stats = (base.groupBy("p_partkey")
             .agg(F.sum("qty").alias("sum_qty"),
                  F.count(F.lit(1)).alias("cnt")))
    return (base.join(F.broadcast(stats), "p_partkey")
            .where(5 * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
            .agg((F.floor((2 * F.sum("price_c").cast("double") + 7.0)
                           / 14.0).cast("double") / 100.0)
                  .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_small_lines")))


_Q17_SQL = f"""
WITH base AS (
  SELECT p.p_partkey, CAST(round(l.l_quantity) AS BIGINT) AS qty,
         {_sql_cents('l.l_extendedprice')} AS price_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{_Q17_BRAND}' AND p.p_size < {_Q17_MAX_SIZE}
), stats AS (
  SELECT p_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS cnt
  FROM base GROUP BY p_partkey
)
SELECT CAST(floor((2 * CAST(sum(b.price_c) AS BIGINT) + 7) / 14.0)
            AS BIGINT) / 100.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lines
FROM base b
JOIN stats s ON b.p_partkey = s.p_partkey
WHERE 5 * b.qty * s.cnt < s.sum_qty
"""

QUERIES["small_quantity_revenue"] = (_small_quantity_revenue, _Q17_SQL)


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers (HAVING sum > threshold, top-N)
# ---------------------------------------------------------------------------
_Q18_MIN_QTY = 300


def _large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the top-100 largest orders by total quantity
    threshold, with customer attribution. The reference's ``IN
    (SELECT … HAVING)`` is expressed directly as aggregate→filter→
    join (semantically identical, one pass).

    Scale: lineitem aggregates per order (keyed shuffle), the >300
    filter keeps ~1% of orders, THEN joins orders+customer — the join
    input is post-filter tiny, so Catalyst/AQE broadcasts it against
    the dimension reads. Top-100 is TakeOrdered on (totalprice,
    orderkey) — id tie-break, no range exchange."""
    qty = (load(spark, sf_dir, "lineitem")
           .select("l_orderkey",
                   F.round(F.col("l_quantity")).cast("long").alias("qty"))
           .groupBy("l_orderkey")
           .agg(F.sum("qty").alias("total_qty"))
           .where(F.col("total_qty") > _Q18_MIN_QTY))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (qty.join(orders, qty.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate"),
                    _cents("o_totalprice").alias("totalprice_c"),
                    "total_qty")
            .orderBy(F.desc("totalprice_c"), F.asc("o_orderkey"))
            .limit(100))


_Q18_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {_sql_cents('o.o_totalprice')} AS totalprice_c,
       q.total_qty
FROM (SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING total_qty > {_Q18_MIN_QTY}) q
JOIN orders o   ON q.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice_c DESC, o.o_orderkey ASC
LIMIT 100
"""

QUERIES["large_volume_customer"] = (_large_volume_customer, _Q18_SQL)


# ---------------------------------------------------------------------------
# Q19 shape: discounted revenue under disjunctive predicates
# ---------------------------------------------------------------------------
_Q19_ARMS = (  # (brand, qty_lo, qty_hi, size_hi)
    ("Brand#12", 1, 11, 5),
    ("Brand#23", 10, 20, 10),
    ("Brand#34", 20, 30, 15),
)


def _discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR-ed (brand, quantity
    band, size band) arms — the canonical disjunctive-predicate query
    (container/shipmode legs dropped with the columns).

    Scale: part broadcasts (3 columns); the disjunction evaluates
    post-join inside one codegen stage — no multi-pass union of arms;
    one global sum."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    li = (load(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  F.round(F.col("l_quantity")).cast("long").alias("qty"),
                  _disc_price_e4().alias("rev_e4")))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = None
    for brand, lo, hi, size_hi in _Q19_ARMS:
        c = ((F.col("p_brand") == brand)
             & F.col("qty").between(lo, hi)
             & F.col("p_size").between(1, size_hi))
        arm = c if arm is None else (arm | c)
    return (j.where(arm)
            .agg(_money(F.sum("rev_e4")).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


_Q19_ARM_SQL = " OR ".join(
    f"(p.p_brand = '{b}' AND CAST(round(l.l_quantity) AS BIGINT)"
    f" BETWEEN {lo} AND {hi} AND p.p_size BETWEEN 1 AND {sh})"
    for b, lo, hi, sh in _Q19_ARMS)

_Q19_SQL = f"""
SELECT {_sql_money(f'sum({_SQL_DISC_E4})')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q19_ARM_SQL}
"""

QUERIES["discounted_revenue"] = (_discounted_revenue, _Q19_SQL)


# ---------------------------------------------------------------------------
# Q20 shape: potential part promotion (nested semi-joins)
# ---------------------------------------------------------------------------
_Q20_PREFIX = "red"
_Q20_START, _Q20_END = "1997-01-01", "1998-01-01"
_Q20_NATIONS = ("NATION_2", "NATION_17", "NATION_22")  # ASIA trio


def _potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who DOMINATED supply of some
    name-prefixed part in one year — shipped more than half that
    part's total (the availqty > 0.5*sum analog), restricted to a
    nation list. Nested semi-join chain: part-filter → per-(part,supp)
    sums → dominance test → DISTINCT suppliers → name lookup.

    Scale: prefix-filtered part broadcasts; per-(part,supp) aggregate
    is the one keyed shuffle; per-part totals re-aggregate that same
    small frame and broadcast back (integer cross-multiplied
    dominance: ``2*sq > total``); the supplier detail join is
    broadcast; output is DISTINCT over an already-small set."""
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_name").startswith(_Q20_PREFIX))
            .select("p_partkey"))
    nation = (load(spark, sf_dir, "nation")
              .where(F.col("n_name").isin(*_Q20_NATIONS))
              .select("n_nationkey", "n_name"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit(_Q20_START).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(_Q20_END).cast("timestamp")))
          .select("l_partkey", "l_suppkey",
                  F.round(F.col("l_quantity")).cast("long").alias("qty")))
    per_ps = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .groupBy("p_partkey", "l_suppkey")
              .agg(F.sum("qty").alias("sq")))
    per_part = per_ps.groupBy("p_partkey").agg(F.sum("sq").alias("total_q"))
    dominant = (per_ps.join(F.broadcast(per_part), "p_partkey")
                .where(2 * F.col("sq") > F.col("total_q"))
                .select("l_suppkey").distinct())
    return (dominant.join(F.broadcast(supp),
                          dominant.l_suppkey == supp.s_suppkey)
            .select("s_suppkey", "s_name", "n_name"))


_Q20_SQL = f"""
WITH per_ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{_Q20_PREFIX}%'
    AND l.l_shipdate >= TIMESTAMP '{_Q20_START}'
    AND l.l_shipdate <  TIMESTAMP '{_Q20_END}'
  GROUP BY l.l_partkey, l.l_suppkey
), per_part AS (
  SELECT p_partkey, CAST(sum(sq) AS BIGINT) AS total_q
  FROM per_ps GROUP BY p_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM per_ps x
JOIN per_part t ON x.p_partkey = t.p_partkey
JOIN supplier s ON x.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE 2 * x.sq > t.total_q
  AND n.n_name IN {_Q20_NATIONS}
"""

QUERIES["potential_promotion"] = (_potential_promotion, _Q20_SQL)


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------
_Q21_LATE_US = 45 * _DAY_US
_Q21_TOPN = 20


def _waiting_orders_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. The reference's EXISTS(other
    supplier) AND NOT EXISTS(other late supplier) pair is folded into
    one per-order aggregate — ``n_supp > 1 AND n_late == 1 AND me
    late`` — which is semantically identical and replaces two
    self-joins of lineitem with one reduction.

    Scale: lineitem⋈orders keyed on orderkey (status filter pushed);
    per-(order,supp) partial → per-order counts via a second tiny
    aggregate joined back on orderkey; supplier names broadcast.
    Top-20 TakeOrdered with name tie-break."""
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = ((F.unix_micros(F.col("l_shipdate").cast("timestamp"))
             - F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            > F.lit(_Q21_LATE_US)).cast("long")
    from pyspark.sql import Window
    per_os = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .select("o_orderkey", "l_suppkey", late.alias("is_late"))
              .groupBy("o_orderkey", "l_suppkey")
              .agg(F.max("is_late").alias("was_late")))
    # per-order supplier/late counts as a WINDOW over o_orderkey — one
    # repartition instead of aggregate + self-join (saves a shuffle
    # pair and the sort-merge join; order groups are bounded ≤13
    # suppliers, so the window state is trivially small at any scale).
    w = Window.partitionBy("o_orderkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (per_os
            .withColumn("n_supp", F.count(F.lit(1)).over(w))
            .withColumn("n_late", F.sum("was_late").over(w))
            .where((F.col("was_late") == 1) & (F.col("n_supp") > 1)
                   & (F.col("n_late") == 1))
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(_Q21_TOPN))


_Q21_SQL = f"""
WITH per_os AS (
  SELECT o.o_orderkey, l.l_suppkey,
         max(CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                       > {_Q21_LATE_US} THEN 1 ELSE 0 END) AS was_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY o.o_orderkey, l.l_suppkey
), per_o AS (
  SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(was_late) AS BIGINT) AS n_late
  FROM per_os GROUP BY o_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os x
JOIN per_o t    ON x.o_orderkey = t.o_orderkey
JOIN supplier s ON x.l_suppkey = s.s_suppkey
WHERE x.was_late = 1 AND t.n_supp > 1 AND t.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT {_Q21_TOPN}
"""

QUERIES["waiting_orders_supplier"] = (_waiting_orders_supplier, _Q21_SQL)


# ---------------------------------------------------------------------------
# Q22 shape: global sales opportunity (anti join + scalar AVG threshold)
# ---------------------------------------------------------------------------
_Q22_CODES = (1, 3, 5, 7)  # c_custkey % 10 buckets ("country code" analog)
_Q22_LAPSE_CUT = "2000-01-01"  # "no orders" analog: none since this date


def _global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per "country code", count and total balance of
    above-average-balance customers who never placed an order. The
    phone-prefix code maps to ``c_custkey % 10``; the scalar AVG
    threshold is cross-multiplied to pure int64 (``bal_c * cnt >
    sum_c``) so no float average is ever materialized.

    Scale: the positive-balance average over the code subset
    aggregates ONE scan of customer and broadcasts as a 1-row frame;
    the no-orders test is a LEFT ANTI join on custkey (orders scans 1
    column); final aggregate groups 4 codes."""
    cust = (load(spark, sf_dir, "customer")
            .select("c_custkey", _cents("c_acctbal").alias("bal_c"),
                    (F.col("c_custkey") % 10).cast("int").alias("cntrycode"))
            .where(F.col("cntrycode").isin(*_Q22_CODES)))
    avg_f = (cust.where(F.col("bal_c") > 0)
             .agg(F.sum("bal_c").alias("sum_c"),
                  F.count(F.lit(1)).alias("cnt")))
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderdate")
                     >= F.lit(_Q22_LAPSE_CUT).cast("timestamp"))
              .select("o_custkey"))
    return (cust.join(F.broadcast(avg_f))
            .where(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 (F.sum("bal_c").cast("double") / 100.0)
                  .alias("totacctbal")))


_Q22_SQL = f"""
WITH cust AS (
  SELECT c_custkey, {_sql_cents('c_acctbal')} AS bal_c,
         CAST(c_custkey % 10 AS INT) AS cntrycode
  FROM customer
  WHERE CAST(c_custkey % 10 AS INT) IN {_Q22_CODES}
), avg_f AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cust WHERE bal_c > 0
)
SELECT c.cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(c.bal_c) AS BIGINT) / 100.0 AS totacctbal
FROM cust c, avg_f a
WHERE c.bal_c * a.cnt > a.sum_c
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{_Q22_LAPSE_CUT}')
GROUP BY c.cntrycode
"""

QUERIES["global_sales_opportunity"] = (_global_sales_opportunity, _Q22_SQL)
