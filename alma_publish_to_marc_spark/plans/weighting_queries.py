"""Sample weighting, privacy, and robust-estimation operators (round 9).

Training-data pipelines re-weight, de-identify, and sanity-check their
samples before anything reaches a model; this module adds the three
classical instruments not yet in the registry (k-anonymity and the
Hill tail index were checked and already exist — dq_queries /
inference_queries):

- ``raking_ipf_weights``     — iterative proportional fitting (survey
  raking) of per-cell weights to uniform segment × nation margins —
  the domain-mixture calibration step, in exact e6 fixed point.
- ``kalman_filter_1d``       — 1-D Kalman filter over the daily mean
  spend series (integer fixed-point gain recursion — the streaming
  state-estimation primitive).
- ``jackknife_nation_means`` — leave-one-nation-out jackknife of the
  mean balance (group-level stability of a global estimate).

Reference scope: beyond-reference analytics surface; no file:line
parity citations apply.

Determinism: every recursion is an integer fold (small-denominator
rationals; LIST accumulators only); moments are exact integers; there is
no libm call anywhere in the module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

QUERIES: dict = {}

_CACHED: list = []


def unpersist_cached() -> int:
    n = 0
    while _CACHED:
        _CACHED.pop().unpersist()
        n += 1
    return n


_BAL_C = "cast(round(c_acctbal * 100, 0) as bigint)"
_BAL_C_DUCK = "CAST(round(c_acctbal * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# raking_ipf_weights
# ---------------------------------------------------------------------------
_IPF_ROUNDS = 2  # full (segment, nation) sweeps


def _raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / IPF: calibrate per-(segment, nation) cell
    weights so weighted counts match UNIFORM targets on both margins
    (total div 5 per segment, total div 25 per nation) — the classic
    post-stratification / training-mixture calibration step. 2 full
    sweeps; weights live in e6 fixed point and every scale factor is
    the exact integer quotient (target·1e12) div margin_sum, so the
    trajectory is bit-identical across engines by construction.

    Scale: ONE corpus shuffle builds the ≤125-cell table (persisted —
    4 margin steps reuse it; released via unpersist_cached); every
    sweep is a groupBy + broadcast join on that bounded table. At
    100 TB only the first aggregate grows; the IPF loop cost is fixed
    by the margin cardinalities.
    """
    cells = (load(spark, sf_dir, "customer")
             .groupBy(F.col("c_mktsegment").alias("seg"),
                      F.col("c_nationkey").alias("nat"))
             .agg(F.count(F.lit(1)).alias("cnt"))).persist()
    _CACHED.append(cells)
    total = cells.agg(F.sum("cnt").alias("t"))
    w = (cells.crossJoin(F.broadcast(total))
         .select("seg", "nat", "cnt", "t",
                 F.lit(1000000).cast("long").alias("w")))
    for _ in range(_IPF_ROUNDS):
        for margin, card in (("seg", 5), ("nat", 25)):
            msum = (w.groupBy(margin)
                    .agg(F.sum(F.col("w") * F.col("cnt")).alias("msum")))
            w = (w.join(F.broadcast(msum), margin)
                 .select("seg", "nat", "cnt", "t",
                         F.expr(f"(w * (((t div {card}) * 1000000000000)"
                                " div msum)) div 1000000")
                          .cast("long").alias("w")))
    return w.select("seg", "nat", "cnt", F.col("w").alias("w_e6"))


def _ipf_sql() -> str:
    steps = []
    prev = "w0"
    ctes = [f"""cells AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat, count(*) AS cnt
  FROM customer GROUP BY 1, 2
)""", """tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cells)""",
            """w0 AS (
  SELECT seg, nat, cnt, t, CAST(1000000 AS BIGINT) AS w
  FROM cells, tot
)"""]
    i = 0
    for _ in range(_IPF_ROUNDS):
        for margin, card in (("seg", 5), ("nat", 25)):
            i += 1
            ctes.append(f"""m{i} AS (
  SELECT {margin}, CAST(sum(w * cnt) AS BIGINT) AS msum
  FROM {prev} GROUP BY 1
)""")
            ctes.append(f"""w{i} AS (
  SELECT p.seg, p.nat, p.cnt, p.t,
         (p.w * (((p.t // {card}) * 1000000000000) // m.msum)) // 1000000
           AS w
  FROM {prev} p JOIN m{i} m USING ({margin})
)""")
            prev = f"w{i}"
            steps.append(i)
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT seg, nat, cnt, w AS w_e6 FROM {prev}")


QUERIES["raking_ipf_weights"] = (_raking_ipf_weights, _ipf_sql())


# ---------------------------------------------------------------------------
# kalman_filter_1d
# ---------------------------------------------------------------------------
_KF_Q_E3 = 10_000      # process noise (cents², e3)
_KF_R_E3 = 1_000_000   # observation noise (cents², e3)


def _kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter over the daily mean spend series (z_d = mean
    event-value cents per epoch day, integer). State x and covariance
    P live in e3 fixed point; per day: P⁺ = P + Q,
    K_e6 = (P⁺·1e6) div (P⁺+R), x ← x + (K·innov) div 1e6,
    P ← ((1e6−K)·P⁺) div 1e6 — every quotient an integer division
    (truncation matches across engines on the signed innovation term,
    measured r8). Initialized at the first observation with P = R.
    Output: final state, final covariance, Σ|innovation| — the
    steady-state smoother a metrics pipeline runs per series.

    Fold shape: single LIST accumulator [started, x, P, Σ|innov|]
    (1-based in DuckDB; elements wrapped as 1-element lists per the
    CLAUDE.md list_reduce rule) — the verified-safe shape for coupled
    recurrences.

    Scale: one keyed shuffle to the bounded day table; the fold runs
    over the day spine (calendar-bounded), fed by an aggregate —
    passes the mechanical bounded-feeder gate.
    """
    q, r = _KF_Q_E3, _KF_R_E3
    day = (load(spark, sf_dir, "events")
           .select(F.expr("unix_micros(cast(ts as timestamp))"
                          " div 86400000000").alias("d"),
                   F.expr("cast(round(value * 100, 0) as bigint)")
                    .alias("c"))
           .groupBy("d")
           .agg(F.expr("sum(c) div count(1)").alias("z")))
    step = f"""
      aggregate(
        sort_array(collect_list(struct(d, z))),
        array(cast(0 as bigint), cast(0 as bigint), cast(0 as bigint),
              cast(0 as bigint)),
        (acc, e) -> CASE WHEN acc[0] = 0
          THEN array(cast(1 as bigint), e.z * 1000, cast({r} as bigint),
                     cast(0 as bigint))
          ELSE array(
            cast(1 as bigint),
            acc[1] + (((acc[2] + {q}) * 1000000) div (acc[2] + {q} + {r}))
                     * (e.z * 1000 - acc[1]) div 1000000,
            ((1000000 - ((acc[2] + {q}) * 1000000)
                        div (acc[2] + {q} + {r})) * (acc[2] + {q}))
              div 1000000,
            acc[3] + abs(e.z * 1000 - acc[1]))
          END)
    """
    return (day.agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                    F.expr(step).alias("s"))
            .select("n_days",
                    F.expr("s[1]").alias("x_e3"),
                    F.expr("s[2]").alias("p_e3"),
                    F.expr("s[3]").alias("sum_abs_innov_e3")))


_KALMAN_SQL = f"""
WITH day AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           // count(*) AS z
  FROM events GROUP BY 1
),
folded AS (
  SELECT count(*) AS n_days,
         list_reduce(
           list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                         CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                        list([z] ORDER BY d)),
           (acc, e) -> CASE WHEN acc[1] = 0
             THEN [CAST(1 AS BIGINT), e[1] * 1000,
                   CAST({_KF_R_E3} AS BIGINT), CAST(0 AS BIGINT)]
             ELSE [
               CAST(1 AS BIGINT),
               acc[2] + (((acc[3] + {_KF_Q_E3}) * 1000000)
                         // (acc[3] + {_KF_Q_E3} + {_KF_R_E3}))
                        * (e[1] * 1000 - acc[2]) // 1000000,
               ((1000000 - ((acc[3] + {_KF_Q_E3}) * 1000000)
                           // (acc[3] + {_KF_Q_E3} + {_KF_R_E3}))
                 * (acc[3] + {_KF_Q_E3})) // 1000000,
               acc[4] + abs(e[1] * 1000 - acc[2])]
             END) AS s
  FROM day
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       s[2] AS x_e3, s[3] AS p_e3, s[4] AS sum_abs_innov_e3
FROM folded
"""

QUERIES["kalman_filter_1d"] = (_kalman_filter_1d, _KALMAN_SQL)


# ---------------------------------------------------------------------------
# jackknife_nation_means
# ---------------------------------------------------------------------------

def _jackknife_nation_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-NATION-out jackknife of the global mean balance:
    θ₍ᵢ₎ = (S − sᵢ)/(N − nᵢ) per nation at e3 (integer division —
    balances can be negative; truncation toward zero matches across
    engines, measured r8), jackknife variance
    (g−1)/g · Σ(θᵢ − θ̄)² over the g = 25 replicates. Group-level
    influence of each nation on the global estimate — the delete-a-
    group stability check a metrics platform runs before trusting a
    mean.

    Scale: one keyed shuffle to 25 nation sums + one broadcast of the
    1-row global sums; replicate algebra runs on the bounded panel.
    """
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"), F.expr(_BAL_C).alias("bc"))
    per_nat = cust.groupBy("nat").agg(
        F.sum("bc").alias("si"), F.count(F.lit(1)).alias("ni"))
    tot = cust.agg(F.sum("bc").alias("s"),
                   F.count(F.lit(1)).alias("n"))
    reps = (per_nat.crossJoin(F.broadcast(tot))
            .select("nat", "s", "n",
                    F.expr("(1000 * (s - si)) div (n - ni)")
                     .alias("th_i")))
    base = reps.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("th_i").alias("sth"),
        F.min(F.expr("(1000 * s) div n")).alias("theta_e3"))
    dev = (reps.crossJoin(F.broadcast(base))
           .select("g", "theta_e3",
                   F.expr("sth div g").alias("theta_jk_e3"),
                   (F.col("th_i") - F.expr("sth div g")).alias("dv")))
    return (dev.groupBy("g", "theta_e3", "theta_jk_e3")
            .agg(F.expr("((g - 1) * sum(dv * dv)) div g")
                 .alias("jk_var_e6"))
            .select(F.col("g").cast("long").alias("n_nations"),
                    "theta_e3", "theta_jk_e3", "jk_var_e6"))


_JK_SQL = f"""
WITH cust AS (
  SELECT c_nationkey AS nat, {_BAL_C_DUCK} AS bc FROM customer
),
per_nat AS (
  SELECT nat, CAST(sum(bc) AS BIGINT) AS si, count(*) AS ni
  FROM cust GROUP BY 1
),
tot AS (
  SELECT CAST(sum(bc) AS BIGINT) AS s, count(*) AS n FROM cust
),
reps AS (
  SELECT nat, t.s, t.n, (1000 * (t.s - si)) // (t.n - ni) AS th_i
  FROM per_nat, tot t
),
base AS (
  SELECT count(*) AS g, CAST(sum(th_i) AS BIGINT) AS sth,
         min((1000 * s) // n) AS theta_e3
  FROM reps
),
dev AS (
  SELECT b.g, b.theta_e3, b.sth // b.g AS theta_jk_e3,
         r.th_i - b.sth // b.g AS dv
  FROM reps r, base b
)
SELECT CAST(g AS BIGINT) AS n_nations, theta_e3, theta_jk_e3,
       ((g - 1) * CAST(sum(dv * dv) AS BIGINT)) // g AS jk_var_e6
FROM dev GROUP BY g, theta_e3, theta_jk_e3
"""

QUERIES["jackknife_nation_means"] = (_jackknife_nation_means, _JK_SQL)
