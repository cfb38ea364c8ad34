"""Oracle-checked query-optimizer statistics queries: equi-depth
histogram construction, conjunctive-selectivity independence audit,
join-order cost ranking from table statistics, and an AQP
sample-and-extrapolate error audit.

This is the statistics layer a cost-based optimizer (or an AQE-style
runtime re-planner) feeds on: histograms that bound per-bucket depth
error, a measured answer to "does the independence assumption hold for
THESE predicates", the textbook |R⋈S| = |R||S|/max(ndv) estimate
checked against the real intermediate sizes, and the error a uniform
hash sample actually commits per group.

Reference parity note: the reference ETL has no optimizer; this family
extends SURVEY.md §2's beyond-reference warehouse-ops capabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

QUERIES: dict = {}


# --------------------------------------------------------------------------
# Equi-depth histogram over a bounded-alphabet column
# --------------------------------------------------------------------------
HIST_BUCKETS = 8


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of l_quantity: distinct values carry their
    exact counts, the running rank assigns each value to bucket
    floor(B·cum_before / total), and each bucket reports its [lo, hi]
    boundary and actual depth — the optimizer-statistics build that
    bounds range-predicate estimation error (unlike equi-width
    `value_histogram`, depth error here comes only from values that
    straddle a boundary).

    Determinism: pure integer rank arithmetic over exact counts.

    Scale: the corpus aggregates to the DISTINCT-VALUE table first
    (l_quantity has a bounded alphabet — 50 values at every sf), so the
    ordered cumsum window runs on a bounded frame, never on rows (the
    sprt_sequential_test rule). Unbounded-alphabet columns would first
    pre-bucket by a coarse quantizer.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"))
    vals = li.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = F.broadcast(vals.agg(F.sum("n").alias("total")))
    bucketed = (vals.withColumn("cum_before",
                                F.coalesce(F.sum("n").over(w), F.lit(0)))
                .crossJoin(tot)
                .withColumn("bucket", F.expr(
                    f"({HIST_BUCKETS} * cum_before) div total")))
    return (bucketed.groupBy("bucket")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                 F.sum("n").alias("n_rows"))
            .select(F.col("bucket").cast("int").alias("bucket"),
                    F.col("lo").cast("long").alias("lo"),
                    F.col("hi").cast("long").alias("hi"),
                    F.col("n_rows").cast("long").alias("n_rows")))


_EQUI_DEPTH_SQL = f"""
WITH vals AS (
    SELECT CAST(l_quantity AS BIGINT) AS v, count(*) AS n
    FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(n) AS total FROM vals),
bucketed AS (
    SELECT v, n,
           coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
           total
    FROM vals CROSS JOIN tot
)
SELECT CAST(({HIST_BUCKETS} * cum_before) // total AS INT) AS bucket,
       CAST(min(v) AS BIGINT) AS lo,
       CAST(max(v) AS BIGINT) AS hi,
       CAST(sum(n) AS BIGINT) AS n_rows
FROM bucketed
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Conjunctive-selectivity independence audit
# --------------------------------------------------------------------------
def selectivity_independence_audit(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Does the optimizer's independence assumption hold? For each
    pair of a fixed predicate panel, the measured conjunction count
    next to the independence estimate, and their lift ratio
    (1e4 = perfectly independent). This is the audit that tells a
    planner which predicate pairs need a joint histogram / correlated
    stats instead of multiplied selectivities.

    Determinism: exact conditional counts; lift is an integer e4
    rational (at petabyte row counts the product n_ab·n would compute
    in ratio space to stay in int64 — the audit itself is unchanged).

    Scale: ONE scan, one single-row aggregation (all predicate and
    pair counters as conditional sums), unpivoted to a row per pair.
    """
    li = load(spark, sf_dir, "lineitem")
    p = {
        "qty_ge_25": F.col("l_quantity") >= 25,
        "flag_R": F.col("l_returnflag") == "R",
        "disc_ge_05": F.col("l_discount") >= 0.05,
    }
    names = list(p)
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(F.sum(F.when(p[a], 1).otherwise(0)).alias(f"c_{a}"))
    pairs = [(names[i], names[j])
             for i in range(len(names)) for j in range(i + 1, len(names))]
    for a, b in pairs:
        aggs.append(F.sum(F.when(p[a] & p[b], 1).otherwise(0))
                    .alias(f"c_{a}__{b}"))
    row = li.agg(*aggs)
    structs = F.array(*[
        F.struct(F.lit(a).alias("pred_a"), F.lit(b).alias("pred_b"),
                 F.col(f"c_{a}").alias("n_a"), F.col(f"c_{b}").alias("n_b"),
                 F.col(f"c_{a}__{b}").alias("n_ab"))
        for a, b in pairs])
    return (row.select("n", F.explode(structs).alias("s"))
            .select(F.col("s.pred_a").alias("pred_a"),
                    F.col("s.pred_b").alias("pred_b"),
                    F.col("s.n_a").cast("long").alias("n_a"),
                    F.col("s.n_b").cast("long").alias("n_b"),
                    F.col("s.n_ab").cast("long").alias("n_ab"),
                    F.expr("(10000 * s.n_ab * n) div (s.n_a * s.n_b)")
                    .alias("lift_e4")))


def _indep_sql() -> str:
    preds = {
        "qty_ge_25": "l_quantity >= 25",
        "flag_R": "l_returnflag = 'R'",
        "disc_ge_05": "l_discount >= 0.05",
    }
    names = list(preds)
    cols = ["count(*) AS n"]
    for a in names:
        cols.append(f"sum(CASE WHEN {preds[a]} THEN 1 ELSE 0 END) AS c_{a}")
    pairs = [(names[i], names[j])
             for i in range(len(names)) for j in range(i + 1, len(names))]
    for a, b in pairs:
        cols.append(f"sum(CASE WHEN ({preds[a]}) AND ({preds[b]}) "
                    f"THEN 1 ELSE 0 END) AS c_{a}__{b}")
    sel = " UNION ALL ".join(
        f"""SELECT '{a}' AS pred_a, '{b}' AS pred_b,
       CAST(c_{a} AS BIGINT) AS n_a, CAST(c_{b} AS BIGINT) AS n_b,
       CAST(c_{a}__{b} AS BIGINT) AS n_ab,
       CAST((10000 * c_{a}__{b} * n) // (c_{a} * c_{b}) AS BIGINT)
           AS lift_e4
FROM stats""" for a, b in pairs)
    return (f"WITH stats AS (SELECT {', '.join(cols)} FROM lineitem)\n"
            + sel)


# --------------------------------------------------------------------------
# Join-order cost ranking from table statistics
# --------------------------------------------------------------------------
def join_order_cost_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join ordering on statistics alone: for the
    customer ⋈ orders ⋈ lineitem chain, estimate each first-join
    intermediate with the textbook |R⋈S| = |R|·|S| / max(ndv_R(k),
    ndv_S(k)) formula, then measure the REAL intermediate — the
    estimation-error audit that decides whether stats are fresh
    enough to trust for plan choice.

    Determinism: exact counts and exact distinct counts; the estimate
    is integer div arithmetic.

    Scale: the stats pass aggregates each table once (count +
    count(distinct key) — at 100 TB the ndv would come from the HLL
    sketch family instead, same shape); the "actual" counts join only
    the pruned key columns. All single-row frames combine via
    broadcast cross joins.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    s_c = F.broadcast(cust.agg(
        F.count(F.lit(1)).alias("n_c"),
        F.countDistinct("c_custkey").alias("ndv_c")))
    s_o = F.broadcast(orders.agg(
        F.count(F.lit(1)).alias("n_o"),
        F.countDistinct("o_custkey").alias("ndv_o_cust"),
        F.countDistinct("o_orderkey").alias("ndv_o_ord")))
    s_l = F.broadcast(li.agg(
        F.count(F.lit(1)).alias("n_l"),
        F.countDistinct("l_orderkey").alias("ndv_l")))
    act_co = F.broadcast(
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .agg(F.count(F.lit(1)).alias("act_co")))
    act_ol = F.broadcast(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.count(F.lit(1)).alias("act_ol")))
    stats = (s_c.crossJoin(s_o).crossJoin(s_l)
             .crossJoin(act_co).crossJoin(act_ol))
    plans = stats.select(F.explode(F.array(
        F.struct(F.lit("customer_orders_first").alias("plan_name"),
                 F.expr("(n_c * n_o) div greatest(ndv_c, ndv_o_cust)")
                 .alias("est_rows"),
                 F.col("act_co").alias("actual_rows")),
        F.struct(F.lit("orders_lineitem_first").alias("plan_name"),
                 F.expr("(n_o * n_l) div greatest(ndv_o_ord, ndv_l)")
                 .alias("est_rows"),
                 F.col("act_ol").alias("actual_rows")))).alias("s"))
    return plans.select(
        F.col("s.plan_name").alias("plan_name"),
        F.col("s.est_rows").cast("long").alias("est_rows"),
        F.col("s.actual_rows").cast("long").alias("actual_rows"),
        F.expr("(10000 * s.est_rows) div s.actual_rows").alias("err_e4"))


_JOIN_ORDER_SQL = """
WITH s_c AS (SELECT count(*) AS n_c,
                    count(DISTINCT c_custkey) AS ndv_c FROM customer),
s_o AS (SELECT count(*) AS n_o,
               count(DISTINCT o_custkey) AS ndv_o_cust,
               count(DISTINCT o_orderkey) AS ndv_o_ord FROM orders),
s_l AS (SELECT count(*) AS n_l,
               count(DISTINCT l_orderkey) AS ndv_l FROM lineitem),
act_co AS (SELECT count(*) AS act_co
           FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey),
act_ol AS (SELECT count(*) AS act_ol
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
stats AS (SELECT * FROM s_c, s_o, s_l, act_co, act_ol)
SELECT 'customer_orders_first' AS plan_name,
       CAST((n_c * n_o) // greatest(ndv_c, ndv_o_cust) AS BIGINT)
           AS est_rows,
       CAST(act_co AS BIGINT) AS actual_rows,
       CAST((10000 * ((n_c * n_o) // greatest(ndv_c, ndv_o_cust)))
            // act_co AS BIGINT) AS err_e4
FROM stats
UNION ALL
SELECT 'orders_lineitem_first',
       CAST((n_o * n_l) // greatest(ndv_o_ord, ndv_l) AS BIGINT),
       CAST(act_ol AS BIGINT),
       CAST((10000 * ((n_o * n_l) // greatest(ndv_o_ord, ndv_l)))
            // act_ol AS BIGINT)
FROM stats
"""


# --------------------------------------------------------------------------
# AQP sample-and-extrapolate error audit
# --------------------------------------------------------------------------
SAMPLE_MOD, SAMPLE_REM = 20, 7     # deterministic 5% key sample


def sample_extrapolate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing audit: a deterministic 5% key
    sample (l_orderkey % 20 == 7 — same rows in both engines and at
    every sf) answers `sum(l_quantity) GROUP BY l_returnflag`, scaled
    by 20, next to the exact answer and the committed error — the
    per-group accuracy dashboard that decides which dashboards may run
    on the sample tier.

    Determinism: quantities are whole numbers (exact long casts);
    everything else is integer arithmetic.

    Scale: ONE scan computes both the exact and the conditional sample
    aggregates (the sample is a filter inside a conditional sum, not a
    second read); grouped output is alphabet-bounded (3 flags).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_orderkey") % SAMPLE_MOD == SAMPLE_REM).alias("in_sample"))
    per_flag = li.groupBy("l_returnflag").agg(
        F.sum("qty").alias("exact_sum"),
        F.sum(F.when(F.col("in_sample"), F.col("qty")).otherwise(0))
        .alias("sample_sum"))
    return per_flag.select(
        "l_returnflag",
        F.col("exact_sum").cast("long").alias("exact_sum"),
        (F.col("sample_sum") * SAMPLE_MOD).cast("long").alias("est_sum"),
        F.expr(f"(10000 * sample_sum * {SAMPLE_MOD}) div exact_sum")
        .alias("ratio_e4"))


_SAMPLE_SQL = f"""
WITH li AS (
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
           l_orderkey % {SAMPLE_MOD} = {SAMPLE_REM} AS in_sample
    FROM lineitem
),
per_flag AS (
    SELECT l_returnflag,
           sum(qty) AS exact_sum,
           sum(CASE WHEN in_sample THEN qty ELSE 0 END) AS sample_sum
    FROM li GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(exact_sum AS BIGINT) AS exact_sum,
       CAST(sample_sum * {SAMPLE_MOD} AS BIGINT) AS est_sum,
       CAST((10000 * sample_sum * {SAMPLE_MOD}) // exact_sum AS BIGINT)
           AS ratio_e4
FROM per_flag
"""


QUERIES["equi_depth_histogram"] = (equi_depth_histogram, _EQUI_DEPTH_SQL)
QUERIES["selectivity_independence_audit"] = (
    selectivity_independence_audit, _indep_sql())
QUERIES["join_order_cost_rank"] = (join_order_cost_rank, _JOIN_ORDER_SQL)
QUERIES["sample_extrapolate_error"] = (
    sample_extrapolate_error, _SAMPLE_SQL)


# --------------------------------------------------------------------------
# Exact global percentiles WITHOUT a global sort (two-level bucket walk)
# --------------------------------------------------------------------------
_PCT_TARGETS = (50, 95, 99)


def exact_global_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of the event value column computed WITHOUT
    sorting the corpus: bucket counts (integer value buckets — a
    bounded run table) locate each target's bucket via a cumulative
    walk, then only the rows of the targeted buckets rank locally
    (per-target partitions, each one bucket wide). This is the exact
    counterpart to approx_percentile — the two-level order-statistic
    pattern that replaces `ORDER BY value` over 100 TB with one
    aggregation plus a bucket-sized sort.

    Determinism: values quantize to exact cents (round in both
    engines); target ranks are integer ceil; within-bucket order ties
    break on event_id.

    Scale: ONE corpus scan for bucket counts; the cumulative window
    runs on the ~bounded bucket table; the second scan filters to at
    most |targets| buckets (predicate-pushed); local ranks partition
    per target.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    # Spark integer `div` and DuckDB integer `//` BOTH truncate toward
    # zero (verified -7 div 2 == -7 // 2 == -3, round 8), so this
    # bucket id is engine-identical for ANY sign; truncation is also
    # monotone non-decreasing in cents, which is all the cumulative
    # walk needs (the ADVICE r7 negative-domain concern rested on a
    # wrong premise that DuckDB's integer // floors — it doesn't)
    rows = ev.select("event_id", "cents",
                     F.expr("cents div 100").alias("bucket"))
    bcounts = rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bcounts.select(
        "bucket", "n", F.sum("n").over(w).alias("cum"),
        (F.sum("n").over(w) - F.col("n")).alias("cum_before"))
    total = F.broadcast(bcounts.agg(F.sum("n").alias("tot")))
    targets = F.array(*[F.lit(p) for p in _PCT_TARGETS])
    # first bucket whose cumulative count reaches each target rank
    chosen = (cum.crossJoin(total)
              .select("bucket", "cum_before",
                      F.explode(targets).alias("pct"),
                      F.expr("(tot * pct + 99) div 100").alias("k"),
                      F.col("cum"))
              .where(F.col("cum") >= F.col("k"))
              .groupBy("pct", "k")
              .agg(F.min(F.struct("bucket", "cum_before")).alias("c"))
              .select("pct", "k", F.col("c.bucket").alias("bucket"),
                      F.col("c.cum_before").alias("cum_before")))
    sliced = rows.join(F.broadcast(chosen), "bucket")
    wp = Window.partitionBy("pct").orderBy(
        F.col("cents").asc(), F.col("event_id").asc())
    return (sliced.withColumn("rk", F.row_number().over(wp))
            .where(F.col("rk") == F.col("k") - F.col("cum_before"))
            .select(F.col("pct").cast("int").alias("pct"),
                    F.col("k").cast("long").alias("k"),
                    F.col("cents").alias("pctl_cents")))


def _exact_pctl_sql() -> str:
    targets = " UNION ALL ".join(
        f"SELECT {p} AS pct" for p in _PCT_TARGETS)
    return f"""
WITH rows_t AS (
    SELECT event_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(round(value * 100) AS BIGINT) // 100 AS bucket
    FROM events
),
bcounts AS (SELECT bucket, count(*) AS n FROM rows_t GROUP BY bucket),
cum AS (
    SELECT bucket, n,
           sum(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
               AS cum_before
    FROM bcounts
),
total AS (SELECT sum(n) AS tot FROM bcounts),
targets AS ({targets}),
chosen AS (
    SELECT pct, k,
           (min(struct_pack(bucket := bucket,
                            cum_before := cum_before))).bucket AS bucket,
           (min(struct_pack(bucket := bucket,
                            cum_before := cum_before))).cum_before
               AS cum_before
    FROM (
        SELECT c.bucket, c.cum_before, t.pct,
               (tt.tot * t.pct + 99) // 100 AS k, c.cum
        FROM cum c CROSS JOIN total tt CROSS JOIN targets t
    )
    WHERE cum >= k
    GROUP BY pct, k
),
ranked AS (
    SELECT ch.pct, ch.k, r.cents,
           row_number() OVER (PARTITION BY ch.pct
               ORDER BY r.cents ASC, r.event_id ASC) AS rk,
           ch.cum_before
    FROM rows_t r JOIN chosen ch ON r.bucket = ch.bucket
)
SELECT CAST(pct AS INT) AS pct,
       CAST(k AS BIGINT) AS k,
       CAST(cents AS BIGINT) AS pctl_cents
FROM ranked
WHERE rk = k - cum_before
"""


QUERIES["exact_global_percentile"] = (
    exact_global_percentile, _exact_pctl_sql())
