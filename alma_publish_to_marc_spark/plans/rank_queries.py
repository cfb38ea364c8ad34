"""Nonparametric / rank-based hypothesis tests (round 8).

The inference stack (ks / cvm / chi2 / anova / mann-whitney /
permutation / logrank…) covers two-sample location and independence;
this module adds the remaining classical rank-and-count instruments an
experimentation platform needs when normality can't be assumed:

- ``kruskal_wallis_htest``   — k-sample rank ANOVA over event-type
  value distributions (the nonparametric sibling of
  ``anova_eta_squared``), midranks + tie correction.
- ``wilcoxon_signed_rank``   — paired first-half-vs-second-half user
  spend comparison (the paired sibling of ``auc_mann_whitney``'s
  rank machinery), zero-diff drop + midranks + tie-corrected z.
- ``levene_brown_forsythe``  — equality-of-variance gate (the
  assumption check the parametric ANOVA twin silently makes):
  one-way F on |x − group-median| with exact integer medians.
- ``cochran_q_test``         — k related binary treatments on user
  blocks (did user u ever exceed a spend threshold in event type t),
  fully exact-rational output.

Determinism: every rank is computed from score-RUN aggregates
(groupBy cents — never a global row_number): midrank×2 = 2·lo+cnt−1
stays int64, the per-group rank sums are exact integers, and the only
doubles are IEEE-exact conversions / mul / div / sqrt of those
integers (sqrt is correctly rounded by IEEE-754, unlike ln/exp — no
libm divergence surface). Per-group reductions with non-associative
double terms fold over a group-key-sorted collected array (the
``anova_eta_squared`` idiom, CLAUDE.md float-reduction rule).

Ranks here are over the CENTS alphabet: events.value is a 2-decimal
domain (≤ ~49_002 distinct cent values at any sf), so the run tables
are alphabet-bounded, not corpus-sized — the unpartitioned cumulative
window over them is aggregate-fed and passes the mechanical
bounded-feeder gate (tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

QUERIES: dict = {}

_CENTS = "cast(round(value * 100, 0) as bigint)"


# ---------------------------------------------------------------------------
# Kruskal–Wallis H (k-sample rank ANOVA by event type)
# ---------------------------------------------------------------------------

def _kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H over event-value cents grouped by event_type.

    H = [12/(N(N+1))] · Σ_g S_g²/n_g − 3(N+1), tie-corrected by
    C = 1 − Σ(t³−t)/(N³−N).  S_g (rank sum per group) is exact int64
    via doubled midranks from cents-run aggregates; Σ S_g²/n_g folds
    over the event-type-sorted 5-row group array (fixed association).

    Scale: two keyed aggregates (cents; cents×type) + one cumulative
    window over the alphabet-bounded cents run table; the fold input
    is k=5 rows. No global sort, no corpus-sized single task. int64
    headroom: S2_g ≤ 2N² needs N ≤ 2·10⁹ rows; tie term Σt³ holds to
    ~10⁹ rows per cent value.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_CENTS).alias("cents"))
    runs = ev.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    lo = runs.select(
        "cents", "cnt",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("lo"))
    cell = ev.groupBy("cents", "event_type").agg(
        F.count(F.lit(1)).alias("c"))
    # doubled midrank of the run = 2·lo + cnt − 1; group rank-sum ×2
    per_g = (cell.join(lo, "cents")
             .groupBy("event_type")
             .agg(F.sum(F.col("c") * (2 * F.col("lo") + F.col("cnt") - 1))
                  .alias("s2"),
                  F.sum("c").alias("n")))
    arr = per_g.agg(
        F.array_sort(F.collect_list(F.struct("event_type", "s2", "n")))
        .alias("xs"))
    fold = F.aggregate(
        F.col("xs"),
        F.struct(F.lit(0).cast("long").alias("nn"),
                 F.lit(0.0).alias("ss"),
                 F.lit(0).cast("long").alias("k")),
        lambda acc, e: F.struct(
            (acc["nn"] + e["n"]).alias("nn"),
            (acc["ss"] + e["s2"].cast("double") * e["s2"].cast("double")
             / (4.0 * e["n"].cast("double"))).alias("ss"),
            (acc["k"] + 1).alias("k")))
    ties = runs.agg(F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt")
                          - F.col("cnt")).alias("tie3"))
    m = (arr.select(fold.alias("a"))
         .select(F.col("a.nn").alias("n"), F.col("a.ss").alias("ssum"),
                 F.col("a.k").alias("k"))
         .crossJoin(F.broadcast(ties)))
    nd = F.col("n").cast("double")
    h_raw = (F.lit(12.0) * F.col("ssum") / (nd * (nd + 1.0))
             - 3.0 * (nd + 1.0))
    corr = F.lit(1.0) - F.col("tie3").cast("double") / (nd * nd * nd - nd)
    return m.select(
        F.col("n").alias("n_events"),
        F.col("k").cast("int").alias("k_groups"),
        F.col("tie3").alias("tie_term"),
        F.floor(F.lit(1_000_000.0) * h_raw / corr).cast("long")
        .alias("h_e6"))


_KW_SQL = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), runs AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM ev GROUP BY 1
), lo AS (
  SELECT cents, cnt,
         COALESCE(CAST(sum(cnt) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) + 1 AS lo
  FROM runs
), cell AS (
  SELECT cents, event_type, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), per_g AS (
  SELECT c.event_type,
         CAST(sum(c.c * (2 * l.lo + l.cnt - 1)) AS BIGINT) AS s2,
         CAST(sum(c.c) AS BIGINT) AS n
  FROM cell c JOIN lo l ON c.cents = l.cents
  GROUP BY 1
), arr AS (
  SELECT list(struct_pack(g := event_type, s2 := s2, n := n)
              ORDER BY event_type) AS xs
  FROM per_g
), folded AS (
  SELECT list_reduce(
    list_prepend(struct_pack(nn := 0::BIGINT, ss := 0.0, k := 0::BIGINT),
                 list_transform(xs, e -> struct_pack(
                     nn := e.n, ss := CAST(e.s2 AS DOUBLE), k := e.n))),
    (acc, e) -> struct_pack(
        nn := acc.nn + e.nn,
        ss := acc.ss + e.ss * e.ss / (4.0 * CAST(e.k AS DOUBLE)),
        k := acc.k + 1)) AS a
  FROM arr
), ties AS (
  SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie3 FROM runs
)
SELECT a.nn AS n_events, CAST(a.k AS INT) AS k_groups, t.tie3 AS tie_term,
       CAST(floor(1000000.0
            * (12.0 * a.ss
               / (CAST(a.nn AS DOUBLE) * (CAST(a.nn AS DOUBLE) + 1.0))
               - 3.0 * (CAST(a.nn AS DOUBLE) + 1.0))
            / (1.0 - CAST(t.tie3 AS DOUBLE)
               / (CAST(a.nn AS DOUBLE) * CAST(a.nn AS DOUBLE)
                  * CAST(a.nn AS DOUBLE) - CAST(a.nn AS DOUBLE))))
            AS BIGINT) AS h_e6
FROM folded, ties t
"""

# Oracle fold soundness: single-row frame, fixed k-element list, and
# every accumulator field reads ONLY itself plus ELEMENT fields — the
# CLAUDE.md-tolerated field-wise-additive struct-accumulator case
# (same shape as the proven anova_eta_squared oracle).

QUERIES["kruskal_wallis_htest"] = (_kruskal_wallis, _KW_SQL)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (paired first-half vs second-half user spend)
# ---------------------------------------------------------------------------

def _wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of per-user spend: total event cents
    in the first 15 observed days vs the rest of the month, paired by
    user. Zero differences drop (Wilcoxon convention); |d| midranks
    come from |d|-run aggregates (doubled, exact int64); the output z
    uses the tie-corrected normal approximation

        z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48)

    computed as IEEE ops over exact integers (sqrt is correctly
    rounded — deterministic cross-engine).

    Scale: one keyed user aggregate (the corpus shuffle), then
    everything runs on the n_users-sized diff table and its |d| run
    table — the unpartitioned cumulative window is aggregate-fed.
    The day split derives from the observed min(ts), not a constant.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(_CENTS).alias("cents"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    t0 = ev.agg(F.min("us").alias("us0"))
    day = F.expr("cast((us - us0) div 86400000000 as bigint)")
    diffs = (ev.crossJoin(F.broadcast(t0))
             .select("user_id", "cents", day.alias("day"))
             .groupBy("user_id")
             .agg(F.sum(F.when(F.col("day") < 15, F.col("cents"))
                        .otherwise(0)).alias("x"),
                  F.sum(F.when(F.col("day") >= 15, F.col("cents"))
                        .otherwise(0)).alias("y"))
             .select((F.col("x") - F.col("y")).alias("d"))
             .where(F.col("d") != 0)
             .select(F.abs(F.col("d")).alias("ad"),
                     F.when(F.col("d") > 0, 1).otherwise(0).alias("pos")))
    runs = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("npos"))
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    lo = runs.select(
        "ad", "cnt", "npos",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("lo"))
    sums = lo.agg(
        F.sum(F.col("npos") * (2 * F.col("lo") + F.col("cnt") - 1))
        .alias("wplus2"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .alias("tie3"))
    nd = F.col("n").cast("double")
    num = F.col("wplus2").cast("double") / 2.0 - nd * (nd + 1.0) / 4.0
    var = (nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
           - F.col("tie3").cast("double") / 48.0)
    return sums.select(
        F.col("n").alias("n_pairs"), F.col("wplus2").alias("w_plus_x2"),
        F.col("tie3").alias("tie_term"),
        F.floor(F.lit(1_000_000.0) * num / F.sqrt(var)).cast("long")
        .alias("z_e6"))


_WILCOXON_SQL = """
WITH ev AS (
  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         epoch_us(ts) AS us
  FROM events
), t0 AS (
  SELECT min(us) AS us0 FROM ev
), diffs0 AS (
  SELECT user_id,
         CAST(sum(CASE WHEN (us - us0) // 86400000000 < 15
                       THEN cents ELSE 0 END) AS BIGINT)
         - CAST(sum(CASE WHEN (us - us0) // 86400000000 >= 15
                         THEN cents ELSE 0 END) AS BIGINT) AS d
  FROM ev, t0
  GROUP BY 1
), diffs AS (
  SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
  FROM diffs0 WHERE d <> 0
), runs AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(pos) AS BIGINT) AS npos
  FROM diffs GROUP BY 1
), lo AS (
  SELECT ad, cnt, npos,
         COALESCE(CAST(sum(cnt) OVER (ORDER BY ad
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) + 1 AS lo
  FROM runs
), sums AS (
  SELECT CAST(sum(npos * (2 * lo + cnt - 1)) AS BIGINT) AS wplus2,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie3
  FROM lo
)
SELECT n AS n_pairs, wplus2 AS w_plus_x2, tie3 AS tie_term,
       CAST(floor(1000000.0
            * (CAST(wplus2 AS DOUBLE) / 2.0
               - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
            / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                   * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                   - CAST(tie3 AS DOUBLE) / 48.0)) AS BIGINT) AS z_e6
FROM sums
"""

QUERIES["wilcoxon_signed_rank"] = (_wilcoxon_signed_rank, _WILCOXON_SQL)


# ---------------------------------------------------------------------------
# Levene / Brown–Forsythe equality-of-variance gate
# ---------------------------------------------------------------------------

def _levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe Levene test: one-way ANOVA F on z = |x − med_g|
    over event-value cents by event_type — the variance-homogeneity
    assumption check for the parametric ANOVA twin. Group medians are
    exact DOUBLED integers selected from per-group cents runs (order
    statistics k1=(n+1) div 2, k2=(n+2) div 2 — no percentile_approx),
    so z2 = |2x − med2| is exact int64 and the F statistic follows the
    ``anova_eta_squared`` moment fold bit-for-bit.

    Scale: per-group run tables (groupBy event_type × cents, window
    PARTITIONED by event_type), one corpus re-aggregation to 5 moment
    rows, 5-row fold. No unpartitioned window at all.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_CENTS).alias("cents"))
    runs = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt"))
    wp = (Window.partitionBy("event_type").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1))
    lo = runs.select(
        "event_type", "cents", "cnt",
        (F.coalesce(F.sum("cnt").over(wp), F.lit(0)) + 1).alias("lo"))
    tot = runs.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    # med2 = val(k1) + val(k2), k1 = (n+1) div 2, k2 = (n+2) div 2
    sel = (lo.join(tot, "event_type")
           .select("event_type", "cents", "lo",
                   (F.col("lo") + F.col("cnt") - 1).alias("hi"),
                   F.expr("(n + 1) div 2").alias("k1"),
                   F.expr("(n + 2) div 2").alias("k2")))
    med = (sel.select(
        "event_type",
        F.when((F.col("k1") >= F.col("lo")) & (F.col("k1") <= F.col("hi")),
               F.col("cents")).otherwise(0).alias("m1"),
        F.when((F.col("k2") >= F.col("lo")) & (F.col("k2") <= F.col("hi")),
               F.col("cents")).otherwise(0).alias("m2"))
        .groupBy("event_type")
        .agg((F.sum("m1") + F.sum("m2")).alias("med2")))
    z = (ev.join(F.broadcast(med), "event_type")
         .select("event_type",
                 F.abs(2 * F.col("cents") - F.col("med2")).alias("z2")))
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("z2").alias("s"),
        F.sum(F.col("z2") * F.col("z2")).alias("q"))
    arr = g.agg(F.array_sort(F.collect_list(
        F.struct("event_type", "n", "s", "q"))).alias("xs"))
    fold = F.aggregate(
        F.col("xs"),
        F.struct(F.lit(0).cast("long").alias("nn"),
                 F.lit(0).cast("long").alias("ss"),
                 F.lit(0).cast("long").alias("qq"),
                 F.lit(0.0).alias("btw"),
                 F.lit(0).cast("long").alias("k")),
        lambda acc, e: F.struct(
            (acc["nn"] + e["n"]).alias("nn"),
            (acc["ss"] + e["s"]).alias("ss"),
            (acc["qq"] + e["q"]).alias("qq"),
            (acc["btw"] + e["s"].cast("double") * e["s"].cast("double")
             / e["n"].cast("double")).alias("btw"),
            (acc["k"] + 1).alias("k")))
    m = arr.select(fold.alias("a")).select(
        F.col("a.nn").alias("n"), F.col("a.ss").alias("s"),
        F.col("a.qq").alias("q"), F.col("a.btw").alias("b"),
        F.col("a.k").alias("k"))
    grand = F.col("s").cast("double") * F.col("s").cast("double") \
        / F.col("n").cast("double")
    ss_b = F.col("b") - grand
    ss_w = F.col("q").cast("double") - F.col("b")
    fstat = (ss_b / (F.col("k") - 1).cast("double")) \
        / (ss_w / (F.col("n") - F.col("k")).cast("double"))
    return m.select(
        F.col("n").alias("n_events"), F.col("k").cast("int").alias("k_groups"),
        F.floor(F.lit(10_000.0) * fstat).cast("long").alias("f_e4"))


_LEVENE_SQL = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), runs AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
), lo AS (
  SELECT event_type, cents, cnt,
         COALESCE(CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) + 1 AS lo
  FROM runs
), tot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM runs GROUP BY 1
), sel AS (
  SELECT l.event_type, l.cents, l.lo, l.lo + l.cnt - 1 AS hi,
         (t.n + 1) // 2 AS k1, (t.n + 2) // 2 AS k2
  FROM lo l JOIN tot t ON l.event_type = t.event_type
), med AS (
  SELECT event_type,
         CAST(sum(CASE WHEN k1 BETWEEN lo AND hi THEN cents ELSE 0 END)
              + sum(CASE WHEN k2 BETWEEN lo AND hi THEN cents ELSE 0 END)
              AS BIGINT) AS med2
  FROM sel GROUP BY 1
), z AS (
  SELECT e.event_type, abs(2 * e.cents - m.med2) AS z2
  FROM ev e JOIN med m ON e.event_type = m.event_type
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z2) AS BIGINT) AS s,
         CAST(sum(z2 * z2) AS BIGINT) AS q
  FROM z GROUP BY 1
), arr AS (
  SELECT list(struct_pack(g := event_type, n := n, s := s, q := q)
              ORDER BY event_type) AS xs
  FROM g
), folded AS (
  SELECT list_reduce(
    list_prepend(struct_pack(nn := 0::BIGINT, ss := 0::BIGINT,
                             qq := 0::BIGINT, btw := 0.0, k := 0::BIGINT),
                 list_transform(xs, e -> struct_pack(
                     nn := e.n, ss := e.s, qq := e.q,
                     btw := CAST(e.s AS DOUBLE), k := e.n))),
    (acc, e) -> struct_pack(
        nn := acc.nn + e.nn,
        ss := acc.ss + e.ss,
        qq := acc.qq + e.qq,
        btw := acc.btw + CAST(e.ss AS DOUBLE) * CAST(e.ss AS DOUBLE)
                         / CAST(e.nn AS DOUBLE),
        k := acc.k + 1)) AS a
  FROM arr
)
SELECT a.nn AS n_events, CAST(a.k AS INT) AS k_groups,
       CAST(floor(10000.0
            * ((a.btw - CAST(a.ss AS DOUBLE) * CAST(a.ss AS DOUBLE)
                        / CAST(a.nn AS DOUBLE))
               / (CAST(a.k AS DOUBLE) - 1.0))
            / ((CAST(a.qq AS DOUBLE) - a.btw)
               / (CAST(a.nn AS DOUBLE) - CAST(a.k AS DOUBLE))))
            AS BIGINT) AS f_e4
FROM folded
"""

QUERIES["levene_brown_forsythe"] = (_levene_brown_forsythe, _LEVENE_SQL)


# ---------------------------------------------------------------------------
# Cochran's Q (k related binary treatments on user blocks)
# ---------------------------------------------------------------------------

COCHRAN_CENTS = 25_000  # "big spend" threshold: value > 250.00


def _cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over the user × event-type binary incidence matrix
    (x_{u,t} = 1 iff user u ever logged an event of type t with value
    above 250.00): "do the k=5 event types differ in their propensity
    to carry big-spend users?" Fully exact-rational:

        Q = (k−1)·(k·ΣC_j² − (ΣC)²) / (k·ΣR_i − ΣR_i²)

    with C_j column totals over all users and R_i row totals; the e6
    output is an integer division (truncation identical cross-engine).
    All-0 / all-1 rows cancel in both numerator and denominator, so no
    block filtering is needed.

    Scale: one (user,type)-keyed aggregate, then user-keyed and
    type-keyed count rollups — three shuffles on bounded-width keys,
    1-row output. int64 headroom: C_j² needs ≤ ~3·10⁹ users.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr(_CENTS).alias("cents"))
    x = (ev.where(F.col("cents") > COCHRAN_CENTS)
         .select("user_id", "event_type").distinct())
    cols = x.groupBy("event_type").agg(F.count(F.lit(1)).alias("cj"))
    rows = x.groupBy("user_id").agg(F.count(F.lit(1)).alias("ri"))
    csum = cols.agg(F.sum("cj").alias("sc"),
                    F.sum(F.col("cj") * F.col("cj")).alias("sc2"),
                    F.count(F.lit(1)).alias("k"))
    rsum = rows.agg(F.sum("ri").alias("sr"),
                    F.sum(F.col("ri") * F.col("ri")).alias("sr2"),
                    F.count(F.lit(1)).alias("n_blocks"))
    j = (csum.crossJoin(F.broadcast(rsum))
         .select("k", "n_blocks",
                 ((F.col("k") - 1) * (F.col("k") * F.col("sc2")
                                      - F.col("sc") * F.col("sc")))
                 .alias("q_num"),
                 (F.col("k") * F.col("sr") - F.col("sr2")).alias("q_den")))
    return j.select(
        F.col("k").cast("int").alias("k_treatments"), "n_blocks",
        "q_num", "q_den",
        F.expr("(1000000 * q_num) div q_den").alias("q_e6"))


_COCHRAN_SQL = """
WITH x AS (
  SELECT DISTINCT user_id, event_type
  FROM events
  WHERE CAST(round(value * 100, 0) AS BIGINT) > 25000
), cols AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cj FROM x GROUP BY 1
), rows_ AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS ri FROM x GROUP BY 1
), csum AS (
  SELECT CAST(sum(cj) AS BIGINT) AS sc,
         CAST(sum(cj * cj) AS BIGINT) AS sc2,
         CAST(count(*) AS BIGINT) AS k
  FROM cols
), rsum AS (
  SELECT CAST(sum(ri) AS BIGINT) AS sr,
         CAST(sum(ri * ri) AS BIGINT) AS sr2,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM rows_
)
SELECT CAST(k AS INT) AS k_treatments, n_blocks,
       (k - 1) * (k * sc2 - sc * sc) AS q_num,
       k * sr - sr2 AS q_den,
       (1000000 * ((k - 1) * (k * sc2 - sc * sc))) // (k * sr - sr2)
           AS q_e6
FROM csum, rsum
"""

QUERIES["cochran_q_test"] = (_cochran_q, _COCHRAN_SQL)


# ---------------------------------------------------------------------------
# Friedman test (k related samples on user blocks)
# ---------------------------------------------------------------------------

def _friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test over complete user blocks: does per-user total
    spend differ systematically across the k=5 event types? The
    within-block treatment ranks use doubled midranks computed from
    the k×k per-user comparison join (r2 = 2 + 2·#less + #equal-other
    — never an engine rank function), absent (user, type) cells fill
    with 0 so every block is complete. With doubled ranks the
    tie-corrected statistic is FULLY exact-rational:

        χ² = (k−1)·Σ_j (R2_j − n(k+1))² / (A2 − n·k·(k+1)²)

    where R2_j is the doubled rank sum of treatment j and
    A2 = Σ 4r² over all cells; the e6 output is one integer division.
    (The Cochran-Q sibling covers binary outcomes; this covers
    ordinal/continuous ones.)

    Scale: one (user,type) aggregate, a users×5 completion join, a
    k×k-bounded per-user comparison join keyed on user, then two
    bounded reductions. Headroom: A2 ≤ 4nk·(2k)² — int64 to ~10¹⁵
    blocks.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr(_CENTS).alias("cents"))
    types = ev.select("event_type").distinct()
    users = ev.select("user_id").distinct()
    cells = (users.crossJoin(F.broadcast(types))
             .join(ev.groupBy("user_id", "event_type")
                     .agg(F.sum("cents").alias("v")),
                   ["user_id", "event_type"], "left")
             .select("user_id", "event_type",
                     F.coalesce("v", F.lit(0)).alias("v")))
    o = cells.select(F.col("user_id").alias("uid"),
                     F.col("event_type").alias("o_type"),
                     F.col("v").alias("ov"))
    r2 = (cells.join(o, (cells.user_id == o.uid)
                     & (cells.event_type != o.o_type))
          .groupBy("user_id", "event_type")
          .agg((F.lit(2)
                + 2 * F.sum(F.when(F.col("ov") < F.col("v"), 1)
                            .otherwise(0))
                + F.sum(F.when(F.col("ov") == F.col("v"), 1)
                        .otherwise(0))).alias("r2")))
    per_t = r2.groupBy("event_type").agg(F.sum("r2").alias("rsum2"))
    a2 = r2.agg(F.sum(F.col("r2") * F.col("r2")).alias("a2"),
                F.countDistinct("user_id").alias("n"),
                F.countDistinct("event_type").alias("k"))
    j = per_t.crossJoin(F.broadcast(a2))
    dev = F.col("rsum2") - F.col("n") * (F.col("k") + 1)
    num_parts = j.groupBy("a2", "n", "k").agg(
        F.sum(dev * dev).alias("ssq"))
    return (num_parts
            .select(F.col("n").alias("n_blocks"),
                    F.col("k").cast("int").alias("k"),
                    ((F.col("k") - 1) * F.col("ssq")).alias("chi2_num"),
                    (F.col("a2") - F.col("n") * F.col("k")
                     * (F.col("k") + 1) * (F.col("k") + 1))
                    .alias("chi2_den"))
            .select("n_blocks", "k", "chi2_num", "chi2_den",
                    F.expr("(1000000 * chi2_num) div chi2_den")
                    .alias("chi2_e6")))


_FRIEDMAN_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), types AS (SELECT DISTINCT event_type FROM ev),
users AS (SELECT DISTINCT user_id FROM ev),
sums AS (
  SELECT user_id, event_type, CAST(sum(cents) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2
), cells AS (
  SELECT u.user_id, t.event_type, COALESCE(s.v, 0) AS v
  FROM users u CROSS JOIN types t
  LEFT JOIN sums s ON s.user_id = u.user_id
                  AND s.event_type = t.event_type
), r2 AS (
  SELECT c.user_id, c.event_type,
         2 + 2 * CAST(sum(CASE WHEN o.v < c.v THEN 1 ELSE 0 END) AS BIGINT)
           + CAST(sum(CASE WHEN o.v = c.v THEN 1 ELSE 0 END) AS BIGINT)
             AS r2
  FROM cells c JOIN cells o ON c.user_id = o.user_id
                           AND c.event_type <> o.event_type
  GROUP BY 1, 2
), per_t AS (
  SELECT event_type, CAST(sum(r2) AS BIGINT) AS rsum2 FROM r2 GROUP BY 1
), tot AS (
  SELECT CAST(sum(r2 * r2) AS BIGINT) AS a2,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k
  FROM r2
)
SELECT t.n AS n_blocks, CAST(t.k AS INT) AS k,
       (t.k - 1) * CAST(sum((p.rsum2 - t.n * (t.k + 1))
                            * (p.rsum2 - t.n * (t.k + 1))) AS BIGINT)
           AS chi2_num,
       t.a2 - t.n * t.k * (t.k + 1) * (t.k + 1) AS chi2_den,
       (1000000 * ((t.k - 1)
            * CAST(sum((p.rsum2 - t.n * (t.k + 1))
                       * (p.rsum2 - t.n * (t.k + 1))) AS BIGINT)))
           // (t.a2 - t.n * t.k * (t.k + 1) * (t.k + 1)) AS chi2_e6
FROM per_t p, tot t
GROUP BY t.n, t.k, t.a2
"""

QUERIES["friedman_test"] = (_friedman_test, _FRIEDMAN_SQL)


# ---------------------------------------------------------------------------
# Energy distance two-sample test (exact integer pairwise-distance sums)
# ---------------------------------------------------------------------------

def _energy_distance_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between the 'click' and 'view' value
    distributions: E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — the
    kernel-family cousin of the KS/CvM/Wasserstein twins (sensitive to
    ALL moments, not just location). In 1-D every pairwise sum
    Σ|a−b| is exact from sorted cents RUNS via the prefix identity
    Σ_pairs = Σ_v c_v·(v·cum_cnt< − cum_sum<), so the three sums are
    exact int64 and only the final 1-row normalization divides into
    doubles.

    Scale: one cents×group run aggregate, one cumulative window over
    the alphabet-bounded run table (aggregate-fed), a 1-row readout.
    Headroom: v·cumcnt ≤ 5·10⁴·N cents-rows — int64 to ~10¹⁴ rows.
    """
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type").isin("click", "view"))
          .select(F.when(F.col("event_type") == "click", 1).otherwise(0)
                  .alias("g"),
                  F.expr(_CENTS).alias("v")))
    runs = ev.groupBy("v").agg(
        F.sum("g").alias("cx"),
        F.sum(F.lit(1) - F.col("g")).alias("cy"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = runs.select(
        "v", "cx", "cy",
        F.coalesce(F.sum("cx").over(w), F.lit(0)).alias("px"),
        F.coalesce(F.sum("cy").over(w), F.lit(0)).alias("py"),
        F.coalesce(F.sum(F.col("cx") * F.col("v")).over(w), F.lit(0))
        .alias("sx"),
        F.coalesce(F.sum(F.col("cy") * F.col("v")).over(w), F.lit(0))
        .alias("sy"))
    sums = cum.agg(
        F.sum(F.col("cx") * (F.col("v") * F.col("px") - F.col("sx")))
        .alias("dxx"),
        F.sum(F.col("cy") * (F.col("v") * F.col("py") - F.col("sy")))
        .alias("dyy"),
        F.sum(F.col("cx") * (F.col("v") * F.col("py") - F.col("sy"))
              + F.col("cy") * (F.col("v") * F.col("px") - F.col("sx")))
        .alias("dxy"),
        F.sum("cx").alias("nx"), F.sum("cy").alias("ny"))
    nx, ny = F.col("nx").cast("double"), F.col("ny").cast("double")
    energy = (2.0 * F.col("dxy").cast("double") / (nx * ny)
              - 2.0 * F.col("dxx").cast("double") / (nx * nx)
              - 2.0 * F.col("dyy").cast("double") / (ny * ny))
    return sums.select(
        "nx", "ny", "dxy", "dxx", "dyy",
        F.floor(energy * 1_000.0).cast("long").alias("energy_m_cents"))


_ENERGY_SQL = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')
), runs AS (
  SELECT v, CAST(sum(g) AS BIGINT) AS cx,
         CAST(sum(1 - g) AS BIGINT) AS cy
  FROM ev GROUP BY 1
), cum AS (
  SELECT v, cx, cy,
         COALESCE(CAST(sum(cx) OVER w AS BIGINT), 0) AS px,
         COALESCE(CAST(sum(cy) OVER w AS BIGINT), 0) AS py,
         COALESCE(CAST(sum(cx * v) OVER w AS BIGINT), 0) AS sx,
         COALESCE(CAST(sum(cy * v) OVER w AS BIGINT), 0) AS sy
  FROM runs
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING)
), sums AS (
  SELECT CAST(sum(cx * (v * px - sx)) AS BIGINT) AS dxx,
         CAST(sum(cy * (v * py - sy)) AS BIGINT) AS dyy,
         CAST(sum(cx * (v * py - sy) + cy * (v * px - sx)) AS BIGINT)
             AS dxy,
         CAST(sum(cx) AS BIGINT) AS nx, CAST(sum(cy) AS BIGINT) AS ny
  FROM cum
)
SELECT nx, ny, dxy, dxx, dyy,
       CAST(floor(1000.0 * (
           2.0 * CAST(dxy AS DOUBLE) / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
           - 2.0 * CAST(dxx AS DOUBLE) / (CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
           - 2.0 * CAST(dyy AS DOUBLE) / (CAST(ny AS DOUBLE) * CAST(ny AS DOUBLE))))
           AS BIGINT) AS energy_m_cents
FROM sums
"""

QUERIES["energy_distance_two_sample"] = (_energy_distance_two_sample,
                                         _ENERGY_SQL)


# ---------------------------------------------------------------------------
# Cohen's d effect size (click vs view values)
# ---------------------------------------------------------------------------

def _cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the 'click' and 'view' value distributions —
    the standardized effect size that turns the significance twins
    (mann-whitney / energy distance / t-machinery) into a MAGNITUDE:
    d = (m̄₁ − m̄₂)/s_pooled with Hedges' small-sample correction
    g = d·(1 − 3/(4(n₁+n₂)−9)). Group moments (n, Σx, Σx²) are exact
    int64 cents; means/variances are IEEE doubles of those integers
    (divisions + one √) — bit-identical cross-engine.

    Scale: one 2-group keyed aggregate, a 1-row readout.
    """
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type").isin("click", "view"))
          .select(F.when(F.col("event_type") == "click", 1).otherwise(0)
                  .alias("g"),
                  F.expr(_CENTS).alias("v")))
    m = ev.agg(
        F.sum("g").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).alias("n2"),
        F.sum(F.col("g") * F.col("v")).alias("s1"),
        F.sum((F.lit(1) - F.col("g")) * F.col("v")).alias("s2"),
        F.sum(F.col("g") * F.col("v") * F.col("v")).alias("q1"),
        F.sum((F.lit(1) - F.col("g")) * F.col("v") * F.col("v"))
        .alias("q2"))
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    ss1 = F.col("q1").cast("double") - n1 * m1 * m1
    ss2 = F.col("q2").cast("double") - n2 * m2 * m2
    sp = F.sqrt((ss1 + ss2) / (n1 + n2 - 2.0))
    d = (m1 - m2) / sp
    g = d * (F.lit(1.0) - 3.0 / (4.0 * (n1 + n2) - 9.0))
    return m.select(
        "n1", "n2",
        F.floor(F.lit(1e6) * d).cast("long").alias("cohens_d_e6"),
        F.floor(F.lit(1e6) * g).cast("long").alias("hedges_g_e6"))


_COHENS_SQL = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')
), m AS (
  SELECT CAST(sum(g) AS BIGINT) AS n1,
         CAST(sum(1 - g) AS BIGINT) AS n2,
         CAST(sum(g * v) AS BIGINT) AS s1,
         CAST(sum((1 - g) * v) AS BIGINT) AS s2,
         CAST(sum(g * v * v) AS BIGINT) AS q1,
         CAST(sum((1 - g) * v * v) AS BIGINT) AS q2
  FROM ev
)
SELECT n1, n2,
       CAST(floor(1e6 *
           ((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            / sqrt(((CAST(q1 AS DOUBLE)
                     - CAST(n1 AS DOUBLE)
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                    + (CAST(q2 AS DOUBLE)
                       - CAST(n2 AS DOUBLE)
                         * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                         * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
                   / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))))
           AS BIGINT) AS cohens_d_e6,
       CAST(floor(1e6 *
           ((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            / sqrt(((CAST(q1 AS DOUBLE)
                     - CAST(n1 AS DOUBLE)
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                    + (CAST(q2 AS DOUBLE)
                       - CAST(n2 AS DOUBLE)
                         * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                         * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
                   / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)))
           * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)
                                  + CAST(n2 AS DOUBLE)) - 9.0)))
           AS BIGINT) AS hedges_g_e6
FROM m
"""

QUERIES["cohens_d_effect"] = (_cohens_d_effect, _COHENS_SQL)


# ---------------------------------------------------------------------------
# Post-hoc pairwise mean differences (Bonferroni-corrected z)
# ---------------------------------------------------------------------------
_PH_Z_BONF = 2.807034   # z for two-sided alpha = 0.05 / 10 pairs


def _posthoc_pairwise_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-hoc step after ``anova_eta_squared`` / ``kruskal_
    wallis_htest`` say "the k groups differ": all 10 pairwise
    mean-value differences between event types with large-sample z
    tests at the Bonferroni-corrected level (z* = 2.807 for
    0.05/10, a numeric literal). Group moments (n, Σx, Σx²) are exact
    int64 cents from ONE aggregate; each pair's diff, pooled se and
    verdict are IEEE doubles of those integers.

    Scale: one keyed aggregate to k=5 moment rows, a k²-bounded pair
    self-join, a 10-row readout.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_CENTS).alias("v"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"))
    a = g.select(F.col("event_type").alias("ta"), F.col("n").alias("na"),
                 F.col("s").alias("sa"), F.col("q").alias("qa"))
    b = g.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"),
                 F.col("s").alias("sb"), F.col("q").alias("qb"))
    p = a.join(b, F.col("ta") < F.col("tb"))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (F.col("qa").cast("double") - na * ma * ma) / (na - 1.0)
    vb = (F.col("qb").cast("double") - nb * mb * mb) / (nb - 1.0)
    se = F.sqrt(va / na + vb / nb)
    z = (ma - mb) / se
    return p.select(
        "ta", "tb", "na", "nb",
        F.floor(F.lit(100.0) * (ma - mb)).cast("long")
        .alias("diff_microdollars"),
        F.floor(F.lit(1e6) * z).cast("long").alias("z_e6"),
        F.when(F.abs(z) > _PH_Z_BONF, 1).otherwise(0).cast("int")
        .alias("significant"))


_POSTHOC_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1
), p AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
         a.q AS qa, b.q AS qb
  FROM g a JOIN g b ON a.event_type < b.event_type
)
SELECT ta, tb, na, nb,
       CAST(floor(100.0 * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                           - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
            AS BIGINT) AS diff_microdollars,
       CAST(floor(1e6 *
           ((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
            / sqrt(((CAST(qa AS DOUBLE)
                     - CAST(na AS DOUBLE)
                       * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                       * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)))
                    / (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)
                   + ((CAST(qb AS DOUBLE)
                       - CAST(nb AS DOUBLE)
                         * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                         * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
                      / (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE))))
           AS BIGINT) AS z_e6,
       CAST(CASE WHEN abs(
           (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
           / sqrt(((CAST(qa AS DOUBLE)
                    - CAST(na AS DOUBLE)
                      * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                      * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)))
                   / (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)
                  + ((CAST(qb AS DOUBLE)
                      - CAST(nb AS DOUBLE)
                        * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                        * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
                     / (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE)))
           > {_PH_Z_BONF} THEN 1 ELSE 0 END AS INT) AS significant
FROM p
"""

QUERIES["posthoc_pairwise_diffs"] = (_posthoc_pairwise_diffs,
                                     _POSTHOC_SQL)
