"""Oracle-checked data-governance and operations-policy queries:
generalization-ladder k-anonymity, sensitive-attribute dominance
(attribute-disclosure risk), TTL retention sweep planning, and a
token-bucket rate-limit replay.

These are the gates a data platform runs before release / before
purge / before onboarding a producer: how far must quasi-identifiers
generalize before every class clears k, which classes leak a sensitive
attribute by sheer dominance even when k holds, what a TTL policy will
actually delete, and what a proposed rate limit would have done to
real traffic.

Reference parity note: the reference ETL carries no governance layer;
family extends SURVEY.md §2's beyond-reference capabilities. The QI
conventions mirror dq_queries.k_anonymity_audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..epochs import US_PER_DAY, day_col, sql_day
from ..tables import load

QUERIES: dict = {}


# --------------------------------------------------------------------------
# Generalization-ladder k-anonymity (one GROUPING SETS pass)
# --------------------------------------------------------------------------
_GEN_K = 5
# exact cents bounds of the driver generator (k_anonymity_audit)
_BAL_LO, _BAL_HI = -100_000, 1_000_000


def generalization_ladder_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """k-anonymity up the generalization lattice in ONE pass: level 0
    keeps (nation, segment, balance decile), level 1 coarsens to
    (region, segment, balance quintile), level 2 to (region,
    quintile) — all three evaluated by a single GROUPING SETS
    aggregation. The release process walks this ladder until
    risky_classes hits 0; computing every rung at once is what makes
    the walk one query instead of N.

    Determinism: decile/quintile are the width_bucket floor formula on
    exact cents (k_anonymity_audit convention); levels are identified
    with GROUPING() marker functions (identical semantics in both
    engines), never by data-column nullness — a genuinely NULL QI
    value therefore cannot misattribute a class to a coarser rung.

    Scale: one customers⋈nation broadcast join (25-row dim), one
    grouped aggregation whose key space is the summed QI domains of
    the three rungs (bounded alphabets), then a rung-level rollup.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"))
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey")
    span = _BAL_HI - _BAL_LO
    qi = (cust.join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey)
          .select(
              "c_custkey",
              F.col("c_nationkey").alias("nat"),
              F.col("n_regionkey").alias("reg"),
              F.col("c_mktsegment").alias("seg"),
              F.least(F.lit(9), F.expr(
                  f"((bal_c - {_BAL_LO}) * 10) div {span}"))
              .alias("decile"),
              F.least(F.lit(4), F.expr(
                  f"((bal_c - {_BAL_LO}) * 5) div {span}"))
              .alias("quintile")))
    qi.createOrReplaceTempView("_gen_qi")
    classes = spark.sql("""
        SELECT nat, reg, seg, decile, quintile,
               CASE WHEN grouping(nat) = 0 THEN 0
                    WHEN grouping(seg) = 0 THEN 1
                    ELSE 2 END AS level,
               count(DISTINCT c_custkey) AS class_size
        FROM _gen_qi
        GROUP BY GROUPING SETS ((nat, seg, decile),
                                (reg, seg, quintile),
                                (reg, quintile))
    """)
    return (classes.groupBy("level")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.min("class_size").alias("min_k"),
                 F.sum(F.when(F.col("class_size") < _GEN_K, 1)
                       .otherwise(0)).alias("risky_classes"))
            .select(F.col("level").cast("int").alias("level"),
                    F.col("n_classes").cast("long").alias("n_classes"),
                    F.col("min_k").cast("long").alias("min_k"),
                    F.col("risky_classes").cast("long")
                    .alias("risky_classes")))


_GEN_SQL = f"""
WITH qi AS (
    SELECT c.c_custkey,
           c.c_nationkey AS nat,
           n.n_regionkey AS reg,
           c.c_mktsegment AS seg,
           least(9, ((CAST(round(c.c_acctbal * 100) AS BIGINT)
                      - ({_BAL_LO})) * 10) // {_BAL_HI - _BAL_LO})
               AS decile,
           least(4, ((CAST(round(c.c_acctbal * 100) AS BIGINT)
                      - ({_BAL_LO})) * 5) // {_BAL_HI - _BAL_LO})
               AS quintile
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
classes AS (
    SELECT nat, reg, seg, decile, quintile,
           CASE WHEN grouping(nat) = 0 THEN 0
                WHEN grouping(seg) = 0 THEN 1
                ELSE 2 END AS level,
           count(DISTINCT c_custkey) AS class_size
    FROM qi
    GROUP BY GROUPING SETS ((nat, seg, decile),
                            (reg, seg, quintile),
                            (reg, quintile))
)
SELECT CAST(level AS INT) AS level,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_k,
       CAST(sum(CASE WHEN class_size < {_GEN_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS risky_classes
FROM classes
GROUP BY level
"""


# --------------------------------------------------------------------------
# Sensitive-attribute dominance (attribute-disclosure risk)
# --------------------------------------------------------------------------
_DOM_E4 = 6_000     # a class is dominated when one value holds > 60 %


def sensitive_dominance_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Attribute-disclosure audit: k-anonymity can hold while a class
    still leaks — if 90 % of a class shares one sensitive value, an
    attacker learns it without identifying anyone. Per QI class
    (nation, segment, decile) this measures the top sensitive-value
    share (order priority, via the customers⋈orders join) and rolls
    up per segment: classes audited, classes dominated beyond
    _DOM_E4, and the worst share observed.

    Determinism: the top value per class is a struct-max (count, then
    value text as tie-break — the argmax rule); shares are integer e4.

    Scale: two keyed aggregations (class × value counts, then class
    tops) + the segment rollup; all key spaces bounded by QI × 5
    priorities. The orders join is keyed on custkey.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"))
    span = _BAL_HI - _BAL_LO
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority")
    j = (cust.select(
            "c_custkey", F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.least(F.lit(9), F.expr(
                f"((bal_c - {_BAL_LO}) * 10) div {span}")).alias("decile"))
         .join(orders, F.col("c_custkey") == F.col("o_custkey")))
    vals = (j.groupBy("nat", "seg", "decile", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt")))
    tops = (vals.groupBy("nat", "seg", "decile")
            .agg(F.sum("cnt").alias("class_rows"),
                 F.max(F.struct(F.col("cnt"),
                                F.col("o_orderpriority"))).alias("top"))
            .select("seg",
                    F.expr("(10000 * top.cnt) div class_rows")
                    .alias("dom_e4")))
    return (tops.groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.sum(F.when(F.col("dom_e4") > _DOM_E4, 1).otherwise(0))
                 .alias("n_dominated"),
                 F.max("dom_e4").alias("max_dom_e4"))
            .select(F.col("seg").alias("seg"),
                    F.col("n_classes").cast("long").alias("n_classes"),
                    F.col("n_dominated").cast("long").alias("n_dominated"),
                    F.col("max_dom_e4").cast("long").alias("max_dom_e4")))


_DOM_SQL = f"""
WITH j AS (
    SELECT c.c_custkey, c.c_nationkey AS nat, c.c_mktsegment AS seg,
           least(9, ((CAST(round(c.c_acctbal * 100) AS BIGINT)
                      - ({_BAL_LO})) * 10) // {_BAL_HI - _BAL_LO})
               AS decile,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
),
vals AS (
    SELECT nat, seg, decile, o_orderpriority, count(*) AS cnt
    FROM j GROUP BY 1, 2, 3, 4
),
tops AS (
    SELECT seg,
           (10000 * (max(struct_pack(cnt := cnt,
                                     pri := o_orderpriority))).cnt)
               // sum(cnt) AS dom_e4
    FROM vals GROUP BY nat, seg, decile
)
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN dom_e4 > {_DOM_E4} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dominated,
       CAST(max(dom_e4) AS BIGINT) AS max_dom_e4
FROM tops
GROUP BY seg
"""


# --------------------------------------------------------------------------
# TTL retention sweep planning
# --------------------------------------------------------------------------
# retention days per event type; anything absent defaults to 180
_TTL_DAYS = {"click": 90, "view": 90, "signup": 365,
             "purchase": 730, "error": 30}
_TTL_DEFAULT = 180


def data_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy dry run: per event type, how many rows (and
    payload bytes) a TTL purge would delete, with age measured from
    the corpus max timestamp (deterministic — never wall-clock now()).
    This is the report a compliance purge files BEFORE the delete job
    is allowed to run.

    Determinism: ages are integer epoch-day arithmetic; the horizon
    is the broadcast 1-row max; the TTL table is a literal CASE.

    Scale: one scan + one conditional aggregation per type (alphabet-
    bounded output); the purge itself would reuse the same predicate
    as a partition-pruning filter on a date-partitioned table.
    """
    ev = load(spark, sf_dir, "events")
    ttl = F.coalesce(*[
        F.when(F.col("event_type") == t, F.lit(d))
        for t, d in sorted(_TTL_DAYS.items())
    ], F.lit(_TTL_DEFAULT))
    base = ev.select("event_type",
                     day_col("ts").alias("day"),
                     F.length("props").alias("bytes"),
                     ttl.alias("ttl_days"))
    horizon = F.broadcast(base.agg(F.max("day").alias("h")))
    flagged = base.crossJoin(horizon).select(
        "event_type", "bytes",
        (F.col("day") < F.col("h") - F.col("ttl_days")).alias("expired"))
    return (flagged.groupBy("event_type")
            .agg(F.sum(F.when(F.col("expired"), 1).otherwise(0))
                 .alias("n_expired"),
                 F.sum(F.when(~F.col("expired"), 1).otherwise(0))
                 .alias("n_live"),
                 F.sum(F.when(F.col("expired"), F.col("bytes"))
                       .otherwise(0)).alias("bytes_expired"))
            .select("event_type",
                    F.col("n_expired").cast("long").alias("n_expired"),
                    F.col("n_live").cast("long").alias("n_live"),
                    F.col("bytes_expired").cast("long")
                    .alias("bytes_expired")))


def _ttl_sql() -> str:
    case = " ".join(f"WHEN event_type = '{t}' THEN {d}"
                    for t, d in sorted(_TTL_DAYS.items()))
    return f"""
WITH base AS (
    SELECT event_type,
           {sql_day('ts')} AS day,
           length(props) AS bytes,
           CASE {case} ELSE {_TTL_DEFAULT} END AS ttl_days
    FROM events
),
horizon AS (SELECT max(day) AS h FROM base)
SELECT event_type,
       CAST(sum(CASE WHEN day < h - ttl_days THEN 1 ELSE 0 END) AS BIGINT)
           AS n_expired,
       CAST(sum(CASE WHEN day < h - ttl_days THEN 0 ELSE 1 END) AS BIGINT)
           AS n_live,
       CAST(sum(CASE WHEN day < h - ttl_days THEN bytes ELSE 0 END)
            AS BIGINT) AS bytes_expired
FROM base CROSS JOIN horizon
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Token-bucket rate-limit replay
# --------------------------------------------------------------------------
BUCKET_CAP_MILLI = 3_000        # 3 tokens
# 1 token / 12 h: the events table spans ~30 days with ~half-day mean
# per-user gaps at sf0.1, so this rate denies bursty users but not
# steady ones — both branches exercise with a real spread
REFILL_US_PER_MILLI = 43_200_000
_DENIED_BUCKET_CAP = 10


def token_bucket_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit dry run: replay every user's event stream through a
    token bucket (capacity 3, refill 1 per 12 h) and histogram users by
    how many events the limiter WOULD have denied — the number a
    platform reads before enforcing a quota on live producers.

    Determinism: the bucket state is integer milli-tokens with integer
    refill (gap_us div REFILL_US_PER_MILLI); per-user event order is
    (ts, event_id) — unique in the driver data; the fold accumulator
    is a single LIST [tokens, allowed, denied] (the CLAUDE.md-safe
    shape; elements wrap as single-element lists for the DuckDB
    init-prepend).

    Scale: one shuffle groups events by user; per-user folds are
    O(events) with O(1) state. The histogram output is bounded by the
    denied-bucket cap. This is the batch twin of the
    transformWithState streaming limiter.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    per_user = (ev.groupBy("user_id")
                .agg(F.array_sort(F.collect_list(
                    F.struct("tus", "event_id"))).alias("seq"))
                .select("user_id",
                        F.expr("transform(seq, s -> s.tus)").alias("ts")))
    # gaps[1] = 0 (first event hits a full bucket), then deltas
    fold = (
        f"aggregate("
        f"  transform(ts, (t, i) -> CASE WHEN i = 0 THEN CAST(0 AS BIGINT)"
        f"                               ELSE t - ts[i - 1] END),"
        f"  array(CAST({BUCKET_CAP_MILLI} AS BIGINT), CAST(0 AS BIGINT),"
        f"        CAST(0 AS BIGINT)),"
        f"  (acc, g) -> CASE WHEN least(CAST({BUCKET_CAP_MILLI} AS BIGINT),"
        f"                         acc[0] + g div {REFILL_US_PER_MILLI})"
        f"                    >= 1000"
        f"   THEN array(least(CAST({BUCKET_CAP_MILLI} AS BIGINT),"
        f"                    acc[0] + g div {REFILL_US_PER_MILLI}) - 1000,"
        f"              acc[1] + 1, acc[2])"
        f"   ELSE array(least(CAST({BUCKET_CAP_MILLI} AS BIGINT),"
        f"                    acc[0] + g div {REFILL_US_PER_MILLI}),"
        f"              acc[1], acc[2] + 1) END)")
    stats = per_user.select(
        "user_id", F.expr(fold).alias("st"))
    return (stats.select(
        F.least(F.col("st")[2], F.lit(_DENIED_BUCKET_CAP))
        .alias("denied_bucket"),
        F.col("st")[1].alias("allowed"))
        .groupBy("denied_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"),
             F.sum("allowed").alias("total_allowed"))
        .select(F.col("denied_bucket").cast("long").alias("denied_bucket"),
                F.col("n_users").cast("long").alias("n_users"),
                F.col("total_allowed").cast("long").alias("total_allowed")))


_BUCKET_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
),
per_user AS (
    SELECT user_id,
           list_transform(
               list_sort(list(struct_pack(tus := tus, eid := event_id))),
               s -> s.tus) AS ts
    FROM ev GROUP BY user_id
),
gaps AS (
    SELECT user_id,
           list_transform(range(1, len(ts) + 1),
               i -> CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
                         ELSE ts[i] - ts[i - 1] END) AS gs
    FROM per_user
),
folded AS (
    SELECT user_id,
           list_reduce(
               list_prepend(
                   CAST([{BUCKET_CAP_MILLI}, 0, 0] AS BIGINT[]),
                   list_transform(gs, g -> [g])),
               (acc, xs) -> CASE
                 WHEN least(CAST({BUCKET_CAP_MILLI} AS BIGINT),
                            acc[1] + xs[1] // {REFILL_US_PER_MILLI}) >= 1000
                 THEN [least(CAST({BUCKET_CAP_MILLI} AS BIGINT),
                             acc[1] + xs[1] // {REFILL_US_PER_MILLI}) - 1000,
                       acc[2] + 1, acc[3]]
                 ELSE [least(CAST({BUCKET_CAP_MILLI} AS BIGINT),
                             acc[1] + xs[1] // {REFILL_US_PER_MILLI}),
                       acc[2], acc[3] + 1] END) AS st
    FROM gaps
)
SELECT CAST(least(st[3], {_DENIED_BUCKET_CAP}) AS BIGINT) AS denied_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(st[2]) AS BIGINT) AS total_allowed
FROM folded
GROUP BY 1
"""


QUERIES["generalization_ladder_audit"] = (
    generalization_ladder_audit, _GEN_SQL)
QUERIES["sensitive_dominance_audit"] = (
    sensitive_dominance_audit, _DOM_SQL)
QUERIES["data_retention_sweep"] = (data_retention_sweep, _ttl_sql())
QUERIES["token_bucket_rate_limit"] = (
    token_bucket_rate_limit, _BUCKET_SQL)


# --------------------------------------------------------------------------
# erasure_cascade_audit: right-to-be-forgotten blast radius
# --------------------------------------------------------------------------
ERASE_MOD = 97          # deterministic erasure cohort: custkey % 97 == 0


def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure blast radius: given a deterministic cohort of
    customers to forget (``c_custkey % ERASE_MOD == 0``), count the
    rows each table of the customer→orders→lineitem cascade must
    delete, as absolute rows and e6 share of the table — the impact
    estimate a data-protection officer signs off BEFORE the delete
    job runs (the reference's deleted_record/CDC path answers 'what
    was deleted'; this answers 'what will be').

    Scale: the cohort is customer-scale filtered (broadcast); orders
    semi-join the broadcast cohort; lineitem semi-joins the affected
    orderkeys with an equi hash join — each table is scanned ONCE
    with only its key columns.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    erased = cust.where(F.col("c_custkey") % ERASE_MOD == 0)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eo = orders.join(F.broadcast(erased),
                     orders.o_custkey == erased.c_custkey, "left_semi")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    el = li.join(eo.select("o_orderkey"),
                 li.l_orderkey == eo.o_orderkey, "left_semi")

    def ledger(name, hit_df, total_df):
        h = hit_df.agg(F.count(F.lit(1)).cast("long").alias("n_erased"))
        t = total_df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        return (h.crossJoin(t)
                .select(F.lit(name).alias("table_name"), "n_erased",
                        "n_total",
                        F.expr("(1000000 * n_erased) div n_total")
                         .alias("share_e6")))

    return (ledger("customer", erased, cust)
            .unionByName(ledger("orders", eo, orders))
            .unionByName(ledger("lineitem", el, li)))


_ERASURE_SQL = f"""
WITH erased AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0
),
eo AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM erased)
),
el AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM eo)
)
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM erased) AS BIGINT) AS n_erased,
       CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total,
       (1000000 * CAST((SELECT count(*) FROM erased) AS BIGINT))
           // CAST((SELECT count(*) FROM customer) AS BIGINT) AS share_e6
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM eo) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       (1000000 * CAST((SELECT count(*) FROM eo) AS BIGINT))
           // CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM el) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       (1000000 * CAST((SELECT count(*) FROM el) AS BIGINT))
           // CAST((SELECT count(*) FROM lineitem) AS BIGINT)
"""

QUERIES["erasure_cascade_audit"] = (erasure_cascade_audit, _ERASURE_SQL)


# --------------------------------------------------------------------
# Recursive (c,l)-diversity audit (the gate distinct-l and dominance miss)
# --------------------------------------------------------------------
_RLD_C = 2   # recursive (c, l)-diversity constant
_RLD_L = 3   # require 3 well-represented sensitive values per class


def recursive_l_diversity_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Recursive (c,l)-diversity over the standard QI classes (nation,
    segment, balance decile; sensitive = order priority): a class
    passes iff r1 < c·(r_l + … + r_m) with the per-class sensitive
    counts sorted descending — the Machanavajjhala gate that
    ``k_anonymity_audit``'s distinct-l and the dominance share both
    miss (a class can hold l distinct values yet still be dominated
    once the tail is negligible). With c=2, l=3 the test needs the
    top-TWO counts: violation iff m < 3 or r1 ≥ 2·(tot − r1 − r2).

    Determinism: r1/r2 are selected by a (cnt DESC, value ASC)
    row_number partitioned by class — the id-tie-break rule.

    Scale: class × ≤5-priority count table (QI-domain bounded), one
    partitioned top-2 window, one rollup row. The orders join is
    keyed on custkey; nothing corpus-sized crosses a single task.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"))
    span = _BAL_HI - _BAL_LO
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority")
    j = (cust.select(
            "c_custkey", F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.least(F.lit(9), F.expr(
                f"((bal_c - {_BAL_LO}) * 10) div {span}")).alias("decile"))
         .join(orders, F.col("c_custkey") == F.col("o_custkey")))
    vals = (j.groupBy("nat", "seg", "decile", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt")))
    from pyspark.sql import Window
    w = (Window.partitionBy("nat", "seg", "decile")
         .orderBy(F.desc("cnt"), F.asc("o_orderpriority")))
    ranked = vals.select("nat", "seg", "decile", "cnt",
                         F.row_number().over(w).alias("rn"))
    per_class = (ranked.groupBy("nat", "seg", "decile")
                 .agg(F.sum("cnt").alias("tot"),
                      F.count(F.lit(1)).alias("m"),
                      F.max(F.when(F.col("rn") == 1, F.col("cnt"))
                            .otherwise(0)).alias("r1"),
                      F.max(F.when(F.col("rn") == 2, F.col("cnt"))
                            .otherwise(0)).alias("r2")))
    viol = (F.col("m") < _RLD_L) | (
        F.col("r1") >= _RLD_C * (F.col("tot") - F.col("r1") - F.col("r2")))
    return per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("m") < _RLD_L, 1).otherwise(0)).cast("long")
        .alias("n_under_l_distinct"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long")
        .alias("n_violating"),
        F.max(F.when(~viol,
                     F.expr("10000 * r1 div greatest(tot - r1 - r2, 1)"))
              .otherwise(None)).alias("worst_passing_ratio_e4"))


_RLD_SQL = f"""
WITH qi AS (
  SELECT c.c_custkey, c.c_nationkey AS nat, c.c_mktsegment AS seg,
         least(9, (CAST(round(c.c_acctbal * 100) AS BIGINT)
                   - ({_BAL_LO})) * 10 // {_BAL_HI - _BAL_LO}) AS decile,
         o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
), vals AS (
  SELECT nat, seg, decile, o_orderpriority,
         CAST(count(*) AS BIGINT) AS cnt
  FROM qi GROUP BY 1, 2, 3, 4
), ranked AS (
  SELECT nat, seg, decile, cnt,
         row_number() OVER (PARTITION BY nat, seg, decile
                            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM vals
), per_class AS (
  SELECT nat, seg, decile,
         CAST(sum(cnt) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS m,
         CAST(max(CASE WHEN rn = 1 THEN cnt ELSE 0 END) AS BIGINT) AS r1,
         CAST(max(CASE WHEN rn = 2 THEN cnt ELSE 0 END) AS BIGINT) AS r2
  FROM ranked GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN m < {_RLD_L} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_under_l_distinct,
       CAST(sum(CASE WHEN m < {_RLD_L}
                       OR r1 >= {_RLD_C} * (tot - r1 - r2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       max(CASE WHEN NOT (m < {_RLD_L}
                          OR r1 >= {_RLD_C} * (tot - r1 - r2))
                THEN 10000 * r1 // greatest(tot - r1 - r2, 1)
                ELSE NULL END) AS worst_passing_ratio_e4
FROM per_class
"""

QUERIES["recursive_l_diversity_audit"] = (recursive_l_diversity_audit,
                                          _RLD_SQL)


# --------------------------------------------------------------------------
# privacy_composition_budget (round 11): DP-SGD epsilon accounting
# --------------------------------------------------------------------------
# Basic vs advanced composition (Dwork & Roth 2014, Thm 3.20) of k
# per-step (eps0, delta)-DP releases: eps_basic = k * eps0;
# eps_adv = eps0 * sqrt(2 k ln(1/delta')) + k * eps0 * (e^eps0 - 1).
# Every transcendental of a CONSTANT (ln(1/delta'), e^eps0 - 1) is
# folded in Python and shipped to BOTH engines as the same repr()
# decimal literal (correctly-rounded parse -> identical doubles); the
# only data-dependent math is integer k entering +, *, sqrt — all
# IEEE correctly-rounded, hence bit-identical across engines.
import math as _math

_PCB_LN_INV_DELTA = repr(_math.log(1e5))      # ln(1/delta'), delta'=1e-5
_PCB_GRID = (0.01, 0.02, 0.05)                # per-step eps0 settings


def privacy_composition_budget(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Privacy-budget accounting for per-event-type release pipelines:
    treating each event of a type as one (eps0, 1e-5)-DP adaptive
    release (a DP-SGD step, a per-query DP count), what total epsilon
    has the pipeline spent under basic composition vs the
    sqrt(k)-scaling advanced composition theorem, per candidate eps0?
    The table a privacy review reads to decide whether a mechanism's
    release cadence fits an epsilon budget — and from which step count
    onward the advanced accountant is the one to cite
    (``adv_saves_e6 > 0``).

    Determinism: see module-header note — constants are folded in
    Python once and parsed identically by both engines; per-row double
    math is a fixed tree of correctly-rounded IEEE ops on exact
    integer k, so the e6 floors agree bit-for-bit.

    Scale: ONE events scan reduced map-side to |event_types| rows; the
    eps0 grid explodes literal structs against that tiny frame. At
    100 TB the scan dominates and the shuffle is |event_types| rows.
    """
    jobs = (load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("steps")))
    grid = F.explode(F.array(*[
        F.struct(F.lit(e0).alias("eps0"),
                 F.lit(_math.expm1(e0)).alias("em1"))
        for e0 in _PCB_GRID])).alias("g")
    adv = (f"g.eps0 * sqrt((2.0D * CAST(steps AS DOUBLE))"
           f" * {_PCB_LN_INV_DELTA}D)"
           f" + (CAST(steps AS DOUBLE) * g.eps0) * g.em1")
    return (jobs.select("event_type", "steps", grid)
            .select("event_type", "steps",
                    F.expr("CAST(floor(1000000.0D * g.eps0) AS BIGINT)")
                     .alias("eps0_e6"),
                    F.expr("CAST(floor(1000000.0D * (CAST(steps AS"
                           " DOUBLE) * g.eps0)) AS BIGINT)")
                     .alias("eps_basic_e6"),
                    F.expr(f"CAST(floor(1000000.0D * ({adv}))"
                           f" AS BIGINT)").alias("eps_adv_e6"))
            .withColumn("adv_saves_e6",
                        F.col("eps_basic_e6") - F.col("eps_adv_e6")))


def _pcb_sql() -> str:
    rows = ", ".join(f"({e0!r}, {_math.expm1(e0)!r})"
                     for e0 in _PCB_GRID)
    adv = (f"g.eps0 * sqrt((2.0 * CAST(j.steps AS DOUBLE))"
           f" * {_PCB_LN_INV_DELTA})"
           f" + (CAST(j.steps AS DOUBLE) * g.eps0) * g.em1")
    return f"""
WITH jobs AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS steps
    FROM events GROUP BY event_type
),
grid(eps0, em1) AS (VALUES {rows})
SELECT j.event_type, j.steps,
       CAST(floor(1000000.0 * g.eps0) AS BIGINT) AS eps0_e6,
       CAST(floor(1000000.0 * (CAST(j.steps AS DOUBLE) * g.eps0))
            AS BIGINT) AS eps_basic_e6,
       CAST(floor(1000000.0 * ({adv})) AS BIGINT) AS eps_adv_e6,
       CAST(floor(1000000.0 * (CAST(j.steps AS DOUBLE) * g.eps0))
            AS BIGINT)
           - CAST(floor(1000000.0 * ({adv})) AS BIGINT)
           AS adv_saves_e6
FROM jobs j, grid g
"""


QUERIES["privacy_composition_budget"] = (privacy_composition_budget,
                                         _pcb_sql())
