"""Oracle-checked decision-analytics queries: tail-risk (VaR/CVaR)
per segment, newsvendor stock-level planning with cost audit, and
ABC Pareto classification via a SCALABLE two-level global cumsum.

The common thread is exact order statistics and cumulative shares —
the computations that usually tempt engineers into a full global sort.
abc_pareto_classes is the repo's exemplar for the scalable
alternative: monotone log2 bucketing splits the global running sum
into per-bucket partitioned windows plus a bounded (≤64-row)
bucket-prefix walk, so NO corpus-wide single-partition window exists
at any scale (the fix pattern VERDICT r06 demanded for the
sorted-neighborhood family, demonstrated here as a first-class query).

Reference parity note: no counterpart in the reference ETL; extends
SURVEY.md §2's beyond-reference analytics. Money follows
plans/tpch_queries' exact-cents conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..epochs import US_PER_DAY, day_col, sql_day
from ..tables import load

QUERIES: dict = {}

# Persisted frames released via unpersist_cached() (repo convention)
_PERSISTED: list = []


def unpersist_cached() -> int:
    """Release frames persisted by this module's queries."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


# --------------------------------------------------------------------------
# Tail risk: per-segment VaR / CVaR over order totals
# --------------------------------------------------------------------------
_VAR_PCT = 5      # top 5% tail


def var_cvar_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure tail-risk per market segment: the 95th-percentile
    order total (VaR analog) and the mean of the tail at or beyond it
    (CVaR) — exact order statistics, not approximate percentiles,
    because risk limits are audited against the true tail.

    Determinism: totals are exact cents; the tail size is
    ceil(n·5/100) in integer arithmetic; ranks tie-break on custkey
    then orderkey; CVaR is an integer div mean.

    Scale: windows partition by segment (never global); each segment's
    rank/count pass is one shuffle. At extreme per-segment volumes the
    tail cut would pre-filter with an approximate quantile and
    exact-rank only the candidate tail — same output, bounded window.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), "cents",
        "o_custkey", "o_orderkey")
    w = Window.partitionBy("seg").orderBy(
        F.col("cents").desc(), F.col("o_custkey").asc(),
        F.col("o_orderkey").asc())
    wn = Window.partitionBy("seg")
    ranked = j.select(
        "seg", "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"))
    tail = ranked.where(
        F.col("rk") <= F.expr(f"(n * {_VAR_PCT} + 99) div 100"))
    return (tail.groupBy("seg")
            .agg(F.max("n").alias("n_orders"),
                 F.count(F.lit(1)).alias("tail_k"),
                 F.min("cents").alias("var_cents"),
                 F.expr("sum(cents) div count(1)").alias("cvar_cents"))
            .select("seg",
                    F.col("n_orders").cast("long").alias("n_orders"),
                    F.col("tail_k").cast("long").alias("tail_k"),
                    F.col("var_cents").cast("long").alias("var_cents"),
                    F.col("cvar_cents").cast("long").alias("cvar_cents")))


_VAR_SQL = f"""
WITH j AS (
    SELECT c.c_mktsegment AS seg,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
           o.o_custkey, o.o_orderkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
    SELECT seg, cents,
           row_number() OVER (PARTITION BY seg
               ORDER BY cents DESC, o_custkey ASC, o_orderkey ASC) AS rk,
           count(*) OVER (PARTITION BY seg) AS n
    FROM j
)
SELECT seg,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS tail_k,
       CAST(min(cents) AS BIGINT) AS var_cents,
       CAST(sum(cents) // count(*) AS BIGINT) AS cvar_cents
FROM ranked
WHERE rk <= (n * {_VAR_PCT} + 99) // 100
GROUP BY seg
"""


# --------------------------------------------------------------------------
# Newsvendor stock level with cost audit
# --------------------------------------------------------------------------
_FRACTILE_PCT = 80          # critical fractile Cu/(Cu+Co)
_COST_UNDER, _COST_OVER = 4, 1     # per-unit costs (fractile = 4/5)


def newsvendor_stock_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor planning on the daily-demand run table: the stock
    level is the exact critical-fractile order statistic
    (ceil(n·80/100)-th smallest daily demand), audited with the
    under/over unit costs it would have incurred across history.

    Determinism: daily demands are exact integer quantity sums; the
    fractile index is integer arithmetic; ties in demand break on day.

    Scale: the corpus reduces to the DAY run table first (bounded by
    calendar span), so the ordered rank window runs on a bounded frame
    (the sprt/equi-depth rule); the cost audit is one more pass over
    the same bounded table with the stock level broadcast.
    """
    li = load(spark, sf_dir, "lineitem").select(
        day_col("l_shipdate").alias("day"),
        F.col("l_quantity").cast("long").alias("qty"))
    daily = li.groupBy("day").agg(F.sum("qty").alias("demand"))
    w = Window.orderBy(F.col("demand").asc(), F.col("day").asc())
    ranked = daily.select(
        "day", "demand", F.row_number().over(w).alias("rk"))
    n = F.broadcast(daily.agg(F.count(F.lit(1)).alias("n")))
    stock = F.broadcast(
        ranked.crossJoin(n)
        .where(F.col("rk") == F.expr(f"(n * {_FRACTILE_PCT} + 99) div 100"))
        .select(F.col("demand").alias("stock"), "n"))
    return (daily.crossJoin(stock)
            .agg(F.max("n").cast("long").alias("n_days"),
                 F.max("stock").cast("long").alias("stock_level"),
                 F.sum(F.greatest(F.col("demand") - F.col("stock"),
                                  F.lit(0)) * _COST_UNDER)
                 .cast("long").alias("under_cost"),
                 F.sum(F.greatest(F.col("stock") - F.col("demand"),
                                  F.lit(0)) * _COST_OVER)
                 .cast("long").alias("over_cost")))


_NEWSVENDOR_SQL = f"""
WITH li AS (
    SELECT {sql_day('l_shipdate')} AS day,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
daily AS (SELECT day, sum(qty) AS demand FROM li GROUP BY day),
n AS (SELECT count(*) AS n FROM daily),
ranked AS (
    SELECT day, demand,
           row_number() OVER (ORDER BY demand ASC, day ASC) AS rk
    FROM daily
),
stock AS (
    SELECT r.demand AS stock, n.n
    FROM ranked r CROSS JOIN n
    WHERE r.rk = (n.n * {_FRACTILE_PCT} + 99) // 100
)
SELECT CAST(max(s.n) AS BIGINT) AS n_days,
       CAST(max(s.stock) AS BIGINT) AS stock_level,
       CAST(sum(greatest(d.demand - s.stock, 0) * {_COST_UNDER}) AS BIGINT)
           AS under_cost,
       CAST(sum(greatest(s.stock - d.demand, 0) * {_COST_OVER}) AS BIGINT)
           AS over_cost
FROM daily d CROSS JOIN stock s
"""


# --------------------------------------------------------------------------
# ABC Pareto classes via the two-level global cumsum
# --------------------------------------------------------------------------
_ABC_A_E4, _ABC_B_E4 = 7_000, 9_000    # cumulative-share class cuts


def abc_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by discounted
    revenue, class A = the head covering 70 % of cumulative revenue,
    B to 90 %, C the tail. The global running sum is computed WITHOUT
    a global sort: revenues bucket by their integer log2 (monotone —
    every value in a higher bucket strictly exceeds every value in a
    lower one), the running sum partitions per bucket, and bucket
    prefixes come from a ≤64-row bucket-level walk. This is the
    scalable global-cumsum pattern — the same trick removes any
    corpus-wide single-partition window.

    Determinism: revenue is the exact e4 integer of
    cents·(100−disc_pct), floored to cents for headroom; order is
    (rev DESC, partkey ASC); shares are integer e4 rationals.

    Scale: one lineitem scan → part aggregation (one shuffle), one
    bucket-partitioned window, one bounded bucket walk, broadcast
    total. No stage sorts more than a bucket.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.round(F.col("l_extendedprice") * 100).cast("long")
         * (100 - F.round(F.col("l_discount") * 100).cast("long")))
        .alias("rev_e4"))
    parts = (li.groupBy("l_partkey")
             .agg(F.expr("sum(rev_e4) div 100").alias("rev_c"))
             .where(F.col("rev_c") > 0)
             .select("l_partkey", "rev_c",
                     F.length(F.bin("rev_c")).alias("bucket")))
    # parts feeds the within-bucket window, the bucket walk, and the
    # total — persist so lineitem scans once (multi-branch rule)
    parts = parts.persist()
    _PERSISTED.append(parts)
    w_in = (Window.partitionBy("bucket")
            .orderBy(F.col("rev_c").desc(), F.col("l_partkey").asc())
            .rowsBetween(Window.unboundedPreceding, -1))
    within = parts.select(
        "l_partkey", "rev_c", "bucket",
        F.coalesce(F.sum("rev_c").over(w_in), F.lit(0)).alias("cum_in"))
    b_tot = parts.groupBy("bucket").agg(F.sum("rev_c").alias("b_sum"))
    w_b = (Window.orderBy(F.col("bucket").desc())
           .rowsBetween(Window.unboundedPreceding, -1))
    b_pref = b_tot.select(
        "bucket", F.coalesce(F.sum("b_sum").over(w_b), F.lit(0))
        .alias("b_before"))
    total = F.broadcast(parts.agg(F.sum("rev_c").alias("tot")))
    classed = (within.join(F.broadcast(b_pref), "bucket")
               .crossJoin(total)
               .select(
                   "rev_c",
                   F.expr(f"""CASE
                     WHEN ((b_before + cum_in + rev_c) * 10000) div tot
                          <= {_ABC_A_E4} THEN 'A'
                     WHEN ((b_before + cum_in + rev_c) * 10000) div tot
                          <= {_ABC_B_E4} THEN 'B'
                     ELSE 'C' END""").alias("abc_class"),
                   F.col("tot")))
    return (classed.groupBy("abc_class")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.sum("rev_c").alias("rev_cents"),
                 F.expr("(sum(rev_c) * 10000) div max(tot)")
                 .alias("share_e4"))
            .select("abc_class",
                    F.col("n_parts").cast("long").alias("n_parts"),
                    F.col("rev_cents").cast("long").alias("rev_cents"),
                    F.col("share_e4").cast("long").alias("share_e4")))


_ABC_SQL = f"""
WITH li AS (
    SELECT l_partkey,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
    FROM lineitem
),
parts AS (
    SELECT l_partkey, sum(rev_e4) // 100 AS rev_c,
           length(bin(sum(rev_e4) // 100)) AS bucket
    FROM li GROUP BY l_partkey
    HAVING sum(rev_e4) // 100 > 0
),
within AS (
    SELECT l_partkey, rev_c, bucket,
           coalesce(sum(rev_c) OVER (PARTITION BY bucket
               ORDER BY rev_c DESC, l_partkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_in
    FROM parts
),
b_pref AS (
    SELECT bucket,
           coalesce(sum(b_sum) OVER (ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b_before
    FROM (SELECT bucket, sum(rev_c) AS b_sum FROM parts GROUP BY bucket)
),
total AS (SELECT sum(rev_c) AS tot FROM parts),
classed AS (
    SELECT w.rev_c, t.tot,
           CASE
             WHEN ((b.b_before + w.cum_in + w.rev_c) * 10000) // t.tot
                  <= {_ABC_A_E4} THEN 'A'
             WHEN ((b.b_before + w.cum_in + w.rev_c) * 10000) // t.tot
                  <= {_ABC_B_E4} THEN 'B'
             ELSE 'C' END AS abc_class
    FROM within w
    JOIN b_pref b ON b.bucket = w.bucket
    CROSS JOIN total t
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev_c) AS BIGINT) AS rev_cents,
       CAST((sum(rev_c) * 10000) // max(tot) AS BIGINT) AS share_e4
FROM classed
GROUP BY abc_class
"""


QUERIES["var_cvar_risk"] = (var_cvar_risk, _VAR_SQL)
QUERIES["newsvendor_stock_level"] = (
    newsvendor_stock_level, _NEWSVENDOR_SQL)
QUERIES["abc_pareto_classes"] = (abc_pareto_classes, _ABC_SQL)


# --------------------------------------------------------------------------
# Stockout detection: per-part running balance against initial stock
# --------------------------------------------------------------------------
_STOCK_PER_SIZE = 40     # initial units = p_size * this


def stockout_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory netting: each part starts with p_size×40 units; daily
    shipped quantities draw it down; the first day the running balance
    goes negative is the stockout. Rolled up per brand: parts tracked,
    parts that stock out, and the mean days-until-stockout — the
    operational report behind reorder-point planning.

    Determinism: demands are exact integer sums; the running balance
    is a per-part ordered cumsum (ties impossible: one row per
    (part, day)); first breach via struct-min; the mean is an integer
    div.

    Scale: one lineitem scan → (part, day) aggregation; the cumsum
    window partitions PER PART (never global); part attributes ride a
    broadcast. The same plan nets supply events by unioning them with
    negative sign before the cumsum.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        day_col("l_shipdate").alias("day"),
        F.col("l_quantity").cast("long").alias("qty"))
    daily = li.groupBy("l_partkey", "day").agg(
        F.sum("qty").alias("demand"))
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand"),
        (F.col("p_size").cast("long") * _STOCK_PER_SIZE).alias("stock0"))
    w = (Window.partitionBy("l_partkey").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    run = (daily.join(F.broadcast(part),
                      daily.l_partkey == part.p_partkey)
           .select("l_partkey", "p_brand", "day", "stock0",
                   (F.col("stock0") - F.sum("demand").over(w))
                   .alias("balance")))
    d0 = F.broadcast(li.agg(F.min("day").alias("d0")))
    per_part = (run.groupBy("l_partkey", "p_brand")
                .agg(F.min(F.when(F.col("balance") < 0,
                                  F.struct("day", "balance")))
                     .alias("breach"))
                .crossJoin(d0)
                .select("p_brand",
                        F.col("breach").isNotNull().cast("int")
                        .alias("out"),
                        (F.col("breach.day") - F.col("d0"))
                        .alias("days_to_out")))
    return (per_part.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.sum("out").alias("n_stockout"),
                 F.expr("CASE WHEN sum(out) = 0 THEN -1 ELSE "
                        "sum(coalesce(days_to_out, 0)) div sum(out) END")
                 .alias("mean_days_to_out"))
            .select("p_brand",
                    F.col("n_parts").cast("long").alias("n_parts"),
                    F.col("n_stockout").cast("long").alias("n_stockout"),
                    F.col("mean_days_to_out").cast("long")
                    .alias("mean_days_to_out")))


_STOCKOUT_SQL = f"""
WITH li AS (
    SELECT l_partkey,
           {sql_day('l_shipdate')} AS day,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
daily AS (
    SELECT l_partkey, day, sum(qty) AS demand
    FROM li GROUP BY l_partkey, day
),
run AS (
    SELECT d.l_partkey, p.p_brand, d.day,
           CAST(p.p_size AS BIGINT) * {_STOCK_PER_SIZE}
               - sum(d.demand) OVER (PARTITION BY d.l_partkey
                   ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS balance
    FROM daily d JOIN part p ON d.l_partkey = p.p_partkey
),
d0 AS (SELECT min(day) AS d0 FROM li),
per_part AS (
    SELECT l_partkey, p_brand,
           min(CASE WHEN balance < 0
                    THEN struct_pack(day := day, balance := balance)
               END) AS breach
    FROM run GROUP BY l_partkey, p_brand
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN breach IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stockout,
       CAST(CASE WHEN sum(CASE WHEN breach IS NOT NULL THEN 1 ELSE 0 END)
                      = 0 THEN -1
            ELSE sum(coalesce(breach.day - d0.d0, 0))
                 // sum(CASE WHEN breach IS NOT NULL THEN 1 ELSE 0 END)
            END AS BIGINT) AS mean_days_to_out
FROM per_part CROSS JOIN d0
GROUP BY p_brand
"""


QUERIES["stockout_detection"] = (stockout_detection, _STOCKOUT_SQL)


# --------------------------------------------------------------------------
# ucb1_arm_ranking: bandit allocation audit over event-type arms
# --------------------------------------------------------------------------
UCB_CONV_CENTS = 5000   # reward = 1 when the event's value >= $50


def ucb1_arm_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 scores for the event-type arms: empirical conversion rate
    (value ≥ ``UCB_CONV_CENTS`` cents) plus the exploration bonus
    sqrt(2·ln N / n_i), each e6-floored SEPARATELY (two independent
    double expressions, no compounding) then summed — the allocation
    order an experimentation platform would pull arms in next.

    Determinism: n/conversions are exact ints; ln/sqrt are single
    IEEE expressions written identically in both engines; ranking
    breaks ties on the arm name.

    Scale: ONE map-side-combinable aggregate to |event_type| rows;
    the ranking window runs on that bounded arm table.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long") >= UCB_CONV_CENTS)
        .cast("long").alias("conv"))
    arms = (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("conv").cast("long").alias("conversions")))
    tot = F.broadcast(arms.agg(F.sum("n").cast("long").alias("nn")))
    scored = (arms.crossJoin(tot)
              .select("event_type", "n", "conversions",
                      F.expr("cast(floor(1000000 * (cast(conversions as"
                             " double) / n)) as bigint)").alias("mean_e6"),
                      F.expr("cast(floor(1000000 * sqrt(2.0 * ln("
                             "cast(nn as double)) / n)) as bigint)")
                       .alias("bonus_e6")))
    w = Window.orderBy((F.col("mean_e6") + F.col("bonus_e6")).desc(),
                       F.col("event_type").asc())
    return scored.select(
        "event_type", "n", "conversions", "mean_e6", "bonus_e6",
        (F.col("mean_e6") + F.col("bonus_e6")).alias("ucb_e6"),
        F.row_number().over(w).cast("int").alias("pull_order"))


_UCB_SQL = f"""
WITH arms AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                            >= {UCB_CONV_CENTS} THEN 1 ELSE 0 END)
              AS BIGINT) AS conversions
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM arms),
scored AS (
  SELECT event_type, n, conversions,
         CAST(floor(1000000 * (CAST(conversions AS DOUBLE) / n))
              AS BIGINT) AS mean_e6,
         CAST(floor(1000000 * sqrt(2.0 * ln(CAST(nn AS DOUBLE)) / n))
              AS BIGINT) AS bonus_e6
  FROM arms CROSS JOIN tot
)
SELECT event_type, n, conversions, mean_e6, bonus_e6,
       mean_e6 + bonus_e6 AS ucb_e6,
       CAST(row_number() OVER (ORDER BY mean_e6 + bonus_e6 DESC,
                               event_type ASC) AS INT) AS pull_order
FROM scored
"""

QUERIES["ucb1_arm_ranking"] = (ucb1_arm_ranking, _UCB_SQL)


# --------------------------------------------------------------------------
# successive_halving_plan: hyperband-style arm elimination over sources
# --------------------------------------------------------------------------
SH_BUDGET0 = 4          # docs per arm in round 0; doubles each round
SH_ROUNDS = 3


def successive_halving_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive halving over the document sources as arms: round r
    scores every SURVIVING arm on its first ``SH_BUDGET0·2^r`` docs
    (by doc_id — the deterministic 'spend more budget' sample) using
    mean n_chars as the quality proxy, then keeps the top half
    (ceil, ties on source). Output per source: the round it was
    eliminated (−1 = survived all rounds) and its last score — the
    standard budgeted-search schedule (Hyperband's inner loop) a
    tuning service runs over data sources or configs.

    Determinism: budget samples are doc_id-ranked prefixes; scores
    are exact integer sums with a floored e3 mean; halving cuts rank
    on (score desc, source asc).

    Scale: per round, ONE window partitioned by source (budget
    prefix) + an arm-table rank; arms are a bounded alphabet, so
    every post-scan frame is bounded. The corpus is scanned once per
    round with column pruning (doc_id, source, n_chars).
    """
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars")
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.withColumn("rk", F.row_number().over(wsrc))
    alive = None          # None = all sources alive
    out_rows = None
    for r in range(SH_ROUNDS):
        budget = SH_BUDGET0 * (2 ** r)
        sample = ranked.where(F.col("rk") <= budget)
        if alive is not None:
            sample = sample.join(F.broadcast(alive), "source", "left_semi")
        scores = (sample.groupBy("source")
                  .agg(F.expr("cast((1000 * sum(n_chars)) div count(*)"
                              " as bigint)").alias("score_e3")))
        n_alive = F.broadcast(scores.agg(
            F.count(F.lit(1)).cast("long").alias("na")))
        wcut = Window.orderBy(F.col("score_e3").desc(),
                              F.col("source").asc())
        cut = (scores.crossJoin(n_alive)
               .withColumn("pos", F.row_number().over(wcut).cast("long"))
               .withColumn("keep",
                           (F.col("pos") * 2 <= F.col("na") + 1)
                           .cast("int")))
        dropped = (cut.where(F.col("keep") == 0)
                   .select("source", F.lit(r).alias("eliminated_round"),
                           "score_e3"))
        out_rows = dropped if out_rows is None else out_rows.unionByName(
            dropped)
        alive = cut.where(F.col("keep") == 1).select("source", "score_e3")
    survivors = alive.select(
        "source", F.lit(-1).alias("eliminated_round"), "score_e3")
    return out_rows.unionByName(survivors)


def _sh_sql() -> str:
    ctes = ["""ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
)"""]
    prev_alive = None
    drops = []
    for r in range(SH_ROUNDS):
        budget = SH_BUDGET0 * (2 ** r)
        gate = (f" AND source IN (SELECT source FROM a{r - 1}"
                f" WHERE keep = 1)" if prev_alive else "")
        ctes.append(f"""s{r} AS (
  SELECT source,
         CAST((1000 * sum(n_chars)) // count(*) AS BIGINT) AS score_e3
  FROM ranked WHERE rk <= {budget}{gate}
  GROUP BY 1
)""")
        ctes.append(f"""a{r} AS (
  SELECT source, score_e3,
         CASE WHEN CAST(row_number() OVER (ORDER BY score_e3 DESC,
                        source ASC) AS BIGINT) * 2
                   <= (SELECT count(*) FROM s{r}) + 1
              THEN 1 ELSE 0 END AS keep
  FROM s{r}
)""")
        drops.append(f"SELECT source, {r} AS eliminated_round, score_e3"
                     f" FROM a{r} WHERE keep = 0")
        prev_alive = f"a{r}"
    drops.append(f"SELECT source, -1 AS eliminated_round, score_e3"
                 f" FROM a{SH_ROUNDS - 1} WHERE keep = 1")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(drops)


QUERIES["successive_halving_plan"] = (successive_halving_plan, _sh_sql())


# --------------------------------------------------------------------------
# price_elasticity_by_brand: log-log OLS demand elasticity per brand
# --------------------------------------------------------------------------


def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price demand elasticity per part brand: OLS slope of
    ln(quantity) on ln(unit price) over the brand's lineitems — the
    pricing team's first regression. Unit price = extendedprice /
    quantity; both logs are e3-floored integers PER ROW, so all five
    OLS sums are exact int64 (headroom notes: per-brand n·Σxy stays
    < 2^63 through ~sf1 at e3 scale); the slope is one double
    expression over those sums, e6-floored.

    Scale: part's brand rides a broadcast join; ONE map-side
    aggregate to |brands| rows; slope arithmetic on the bounded brand
    table.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("cast(floor(1000 * ln(l_extendedprice / l_quantity))"
               " as bigint)").alias("x"),
        F.expr("cast(floor(1000 * ln(l_quantity)) as bigint)").alias("y"))
    brand = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sums = (li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy")))
    slope = ("cast(floor(1000000 * (cast(n as double) * sxy"
             " - cast(sx as double) * sy) / (cast(n as double) * sxx"
             " - cast(sx as double) * sx)) as bigint)")
    return sums.select("p_brand", "n", F.expr(slope).alias("elasticity_e6"))


_ELASTICITY_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(1000 * ln(l_extendedprice / l_quantity)) AS BIGINT)
             AS x,
         CAST(floor(1000 * ln(l_quantity)) AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, n,
       CAST(floor(1000000 * (CAST(n AS DOUBLE) * sxy
            - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx
            - CAST(sx AS DOUBLE) * sx)) AS BIGINT) AS elasticity_e6
FROM sums
"""

QUERIES["price_elasticity_by_brand"] = (
    price_elasticity_by_brand, _ELASTICITY_SQL)


# --------------------------------------------------------------------------
# safety_stock_reorder: per-part safety stock + reorder point
# --------------------------------------------------------------------------
SS_LEAD_DAYS = 7
SS_Z_E6 = 1_645_000     # z for 95% cycle service level, e6
SS_TOPN = 25


def safety_stock_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point for the ``SS_TOPN`` highest-
    demand parts: daily demand stats per part from lineitem (exact
    integer Σq, Σq² over OBSERVED demand days), then the textbook
    SS = z·σ_d·√L and ROP = μ_d·L + SS (z = 1.645, L = {SS_LEAD_DAYS}
    days) as single double expressions e6-floored — the inventory
    planner's companion to newsvendor_stock_level / stockout_detection.

    Scale: one (part, day) aggregate, one per-part reduce, TakeOrdered
    top-N by total demand; every stage after the first aggregate is
    part-cardinality-bounded.
    """
    daily = (load(spark, sf_dir, "lineitem")
             .select("l_partkey",
                     F.expr("unix_micros(cast(l_shipdate as timestamp))"
                            " div 86400000000").alias("day"),
                     F.col("l_quantity").cast("long").alias("q"))
             .groupBy("l_partkey", "day")
             .agg(F.sum("q").alias("d")))
    stats = (daily.groupBy("l_partkey")
             .agg(F.count(F.lit(1)).cast("long").alias("nd"),
                  F.sum("d").cast("long").alias("sd"),
                  F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd")))
    mu = "(cast(sd as double) / nd)"
    var = f"((cast(sdd as double) - nd * {mu} * {mu}) / (nd - 1))"
    ss = (f"({SS_Z_E6} / 1e6) * sqrt({var}) * sqrt(cast({SS_LEAD_DAYS}"
          f" as double))")
    return (stats.where(F.col("nd") >= 2)
            .select("l_partkey", "nd", "sd",
                    F.expr(f"cast(floor(1000000 * {mu}) as bigint)")
                     .alias("mu_daily_e6"),
                    F.expr(f"cast(floor(1000000 * {ss}) as bigint)")
                     .alias("safety_stock_e6"),
                    F.expr(f"cast(floor(1000000 * ({mu}"
                           f" * {SS_LEAD_DAYS} + {ss})) as bigint)")
                     .alias("reorder_point_e6"))
            .orderBy(F.col("sd").desc(), F.col("l_partkey").asc())
            .limit(SS_TOPN))


_SAFETY_SQL = f"""
WITH daily AS (
  SELECT l_partkey, epoch_us(l_shipdate) // 86400000000 AS day,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1, 2
),
stats AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(d * d) AS BIGINT) AS sdd
  FROM daily GROUP BY 1
)
SELECT l_partkey, nd, sd,
       CAST(floor(1000000 * (CAST(sd AS DOUBLE) / nd)) AS BIGINT)
           AS mu_daily_e6,
       CAST(floor(1000000 * (({SS_Z_E6} / 1e6)
            * sqrt((CAST(sdd AS DOUBLE) - nd * (CAST(sd AS DOUBLE) / nd)
                    * (CAST(sd AS DOUBLE) / nd)) / (nd - 1))
            * sqrt(CAST({SS_LEAD_DAYS} AS DOUBLE)))) AS BIGINT)
           AS safety_stock_e6,
       CAST(floor(1000000 * ((CAST(sd AS DOUBLE) / nd) * {SS_LEAD_DAYS}
            + ({SS_Z_E6} / 1e6)
            * sqrt((CAST(sdd AS DOUBLE) - nd * (CAST(sd AS DOUBLE) / nd)
                    * (CAST(sd AS DOUBLE) / nd)) / (nd - 1))
            * sqrt(CAST({SS_LEAD_DAYS} AS DOUBLE)))) AS BIGINT)
           AS reorder_point_e6
FROM stats
WHERE nd >= 2
ORDER BY sd DESC, l_partkey ASC
LIMIT {SS_TOPN}
"""

QUERIES["safety_stock_reorder"] = (safety_stock_reorder, _SAFETY_SQL)


# --------------------------------------------------------------------
# Economic order quantity per brand (classic sqrt(2DS/H))
# --------------------------------------------------------------------
EOQ_ORDER_COST_CENTS = 10_000   # fixed cost per replenishment order
EOQ_TOPN = 10


def eoq_order_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part brand: EOQ = √(2·D·S/H) with
    demand D = total lineitem quantity, fixed order cost S, and unit
    holding cost H = 10% of the brand's mean retail price (exact
    integer cents, truncating div) — the replenishment sibling of
    ``newsvendor_stock_level`` (single-period) and
    ``safety_stock_reorder`` (variability buffer). √ is IEEE-exact on
    doubles converted from exact int64, so the e3 floor is
    bit-identical cross-engine.

    Scale: one lineitem⋈part keyed aggregate to the 25-brand table,
    then a TakeOrdered readout. Nothing wider than the brand alphabet
    leaves the first shuffle.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"))
    g = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .groupBy("p_brand")
         .agg(F.sum(F.col("l_quantity").cast("long")).alias("demand"),
              F.expr("sum(price_c) div count(1)").alias("mean_price_c")))
    h = F.expr("mean_price_c div 10")
    eoq = F.floor(F.lit(1000.0) * F.sqrt(
        (2 * F.col("demand") * EOQ_ORDER_COST_CENTS).cast("double")
        / h.cast("double"))).cast("long")
    return (g.select("p_brand", "demand",
                     h.alias("holding_c"), eoq.alias("eoq_e3"))
            .orderBy(F.desc("demand"), F.asc("p_brand")).limit(EOQ_TOPN))


_EOQ_SQL = f"""
WITH g AS (
  SELECT p.p_brand,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand,
         CAST(sum(CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
             // CAST(count(*) AS BIGINT) AS mean_price_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, demand, mean_price_c // 10 AS holding_c,
       CAST(floor(1000.0 * sqrt(
           CAST(2 * demand * {EOQ_ORDER_COST_CENTS} AS DOUBLE)
           / CAST(mean_price_c // 10 AS DOUBLE))) AS BIGINT) AS eoq_e3
FROM g
ORDER BY demand DESC, p_brand ASC
LIMIT {EOQ_TOPN}
"""

QUERIES["eoq_order_quantity"] = (eoq_order_quantity, _EOQ_SQL)


# --------------------------------------------------------------------
# Erlang-B capacity sizing from measured offered load
# --------------------------------------------------------------------
_ERL_GAP_US = 1_800_000_000      # 30-min session gap
_ERL_MAX_K = 64
_ERL_TARGET_E9 = 10_000_000      # blocking target 1%


def erlang_b_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity sizing by the Erlang-B loss formula: measure offered
    load a = Σ(session busy-time)/span from the event stream (30-min
    gap sessionization), then run the standard blocking recursion
    B(k) = a·B(k−1)/(k + a·B(k−1)) and report the smallest server
    count whose blocking drops under 1% — the teletraffic classic
    behind connection-pool / worker-fleet sizing. The recursion is
    pure IEEE mul/div over a rational offered load (exact integer
    micros ratio), folded k = 1..{_ERL_MAX_K} in fixed order — no
    factorials, no libm, bit-identical cross-engine.

    Scale: sessionization is one user-partitioned lag window over the
    corpus; the fold runs on a 1-row frame. Sessions of a single
    event count one second of busy-time (floor, exact).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us")
    marked = ev.select(
        "user_id", "us",
        F.when(F.coalesce(F.col("us") - F.lag("us").over(w),
                          F.lit(_ERL_GAP_US + 1)) > _ERL_GAP_US, 1)
        .otherwise(0).alias("new_s"))
    sess = (marked.select(
        "user_id", "us",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"))
        .groupBy("user_id", "sid")
        .agg((F.max("us") - F.min("us") + 1_000_000).alias("dur_us")))
    span = ev.agg((F.max("us") - F.min("us")).alias("span_us"))
    load_ = (sess.agg(F.sum("dur_us").alias("busy_us"))
             .crossJoin(F.broadcast(span))
             .select("busy_us", "span_us",
                     (F.col("busy_us").cast("double")
                      / F.col("span_us").cast("double")).alias("a")))
    fold = f"""
  aggregate(
    transform(sequence(1, {_ERL_MAX_K}), k -> array(cast(k as double))),
    array(cast(1.0 as double), cast(0.0 as double)),
    (acc, e) -> array(
      (a * element_at(acc, 1))
          / (element_at(e, 1) + a * element_at(acc, 1)),
      CASE WHEN element_at(acc, 2) > 0.0 THEN element_at(acc, 2)
           WHEN (a * element_at(acc, 1))
                / (element_at(e, 1) + a * element_at(acc, 1))
                < {_ERL_TARGET_E9} / 1e9
           THEN element_at(e, 1)
           ELSE cast(0.0 as double) END))
"""
    return load_.select(
        F.floor(F.lit(1e6) * F.col("a")).cast("long").alias("load_e6"),
        F.expr(f"cast(element_at({fold}, 2) as int)")
        .alias("servers_needed"),
        F.expr(f"cast(floor(1e9 * element_at({fold}, 1)) as bigint)")
        .alias("blocking_at_max_e9"))


_ERLANG_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), marked AS (
  SELECT user_id, us,
         CASE WHEN COALESCE(us - lag(us) OVER (PARTITION BY user_id
                                               ORDER BY us),
                            {_ERL_GAP_US + 1}) > {_ERL_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM ev
), sess AS (
  SELECT user_id, sid,
         max(us) - min(us) + 1000000 AS dur_us
  FROM (SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM marked)
  GROUP BY 1, 2
), load_ AS (
  SELECT CAST(sum(dur_us) AS BIGINT) AS busy_us,
         (SELECT max(us) - min(us) FROM ev) AS span_us,
         CAST(sum(dur_us) AS DOUBLE)
             / CAST((SELECT max(us) - min(us) FROM ev) AS DOUBLE) AS a
  FROM sess
), folded AS (
  SELECT busy_us, span_us, a,
         list_reduce(
           list_prepend([1.0::DOUBLE, 0.0::DOUBLE],
               list_transform(range(1, {_ERL_MAX_K} + 1),
                              k -> [CAST(k AS DOUBLE)])),
           (acc, e) -> [
             (a * acc[1]) / (e[1] + a * acc[1]),
             CASE WHEN acc[2] > 0.0 THEN acc[2]
                  WHEN (a * acc[1]) / (e[1] + a * acc[1])
                       < {_ERL_TARGET_E9} / 1e9
                  THEN e[1]
                  ELSE 0.0::DOUBLE END]) AS f
  FROM load_
)
SELECT CAST(floor(1e6 * a) AS BIGINT) AS load_e6,
       CAST(f[2] AS INT) AS servers_needed,
       CAST(floor(1e9 * f[1]) AS BIGINT) AS blocking_at_max_e9
FROM folded
"""

QUERIES["erlang_b_blocking"] = (erlang_b_blocking, _ERLANG_SQL)
