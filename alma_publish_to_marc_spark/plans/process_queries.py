"""Oracle-checked process-mining queries: conformance fitness against
a declared process model, top full-trace variants, and bottleneck
transition latencies.

Process mining turns the raw event log into process answers: does
reality follow the designed flow (conformance), what do the actual
end-to-end journeys look like (variants), and where does time pool
between steps (bottlenecks). Complements the statistical sequence
family (event_transition_matrix / event_sequence_patterns) with the
model-versus-log view.

Reference parity note: no counterpart in the reference ETL; extends
SURVEY.md §2's beyond-reference behavioral analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

QUERIES: dict = {}


# --------------------------------------------------------------------------
# Conformance fitness against a declared directly-follows model
# --------------------------------------------------------------------------
# the designed flow: signup starts things, views lead to clicks,
# clicks to purchases, errors may follow anything but only views may
# follow errors (retry). Everything else is a deviation.
_ALLOWED = (
    ("signup", "view"), ("view", "view"), ("view", "click"),
    ("click", "view"), ("click", "purchase"), ("purchase", "view"),
    ("view", "error"), ("click", "error"), ("error", "view"),
)


def conformance_fitness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directly-follows conformance checking: replay every user's
    trace against the declared transition model and score the fraction
    of observed moves the model allows — the fitness histogram that
    tells a process owner how far reality drifts from design, and
    which decile of users drives the drift.

    Determinism: moves come from a (ts, event_id)-ordered lead per
    user (unique key); fitness is an integer e4 rational; the decile
    is an integer floor.

    Scale: one user-keyed window shuffle builds the moves; the allowed
    set is a broadcast literal; the histogram is a bounded (11-row)
    aggregation. At 100 TB the same plan holds — the model never
    grows with the log.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    moves = (ev.select(
        "user_id", F.col("event_type").alias("frm"),
        F.lead("event_type").over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull()))
    allowed = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in _ALLOWED])
    scored = moves.select(
        "user_id",
        F.array_contains(allowed, F.struct(
            F.col("frm").alias("a"), F.col("nxt").alias("b")))
        .cast("int").alias("ok"))
    per_user = scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum("ok").alias("n_ok"))
    return (per_user
            .select(F.expr("(10 * n_ok) div n_moves").alias("fit_decile"),
                    "n_moves", "n_ok")
            .groupBy("fit_decile")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("n_moves").alias("n_moves"),
                 F.sum("n_ok").alias("n_allowed"))
            .select(F.col("fit_decile").cast("long").alias("fit_decile"),
                    F.col("n_users").cast("long").alias("n_users"),
                    F.col("n_moves").cast("long").alias("n_moves"),
                    F.col("n_allowed").cast("long").alias("n_allowed")))


def _conformance_sql() -> str:
    allowed = ", ".join(f"('{a}', '{b}')" for a, b in _ALLOWED)
    return f"""
WITH moves AS (
    SELECT user_id, event_type AS frm,
           lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS nxt
    FROM events
),
scored AS (
    SELECT user_id,
           CASE WHEN (frm, nxt) IN ({allowed}) THEN 1 ELSE 0 END AS ok
    FROM moves WHERE nxt IS NOT NULL
),
per_user AS (
    SELECT user_id, count(*) AS n_moves, sum(ok) AS n_ok
    FROM scored GROUP BY user_id
)
SELECT CAST((10 * n_ok) // n_moves AS BIGINT) AS fit_decile,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_moves) AS BIGINT) AS n_moves,
       CAST(sum(n_ok) AS BIGINT) AS n_allowed
FROM per_user
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Top full-trace variants
# --------------------------------------------------------------------------
_VARIANT_TOPK = 10


def process_variant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace-variant analysis: each user's COMPLETE ordered event-type
    path (not a fixed n-gram) is one variant; the top variants by user
    count are the de-facto process map — usually a handful of variants
    cover most traffic, and the tail is where exceptions live.

    Determinism: paths order by (ts, event_id); top-k ties break on
    the variant string; counts are exact.

    Scale: one user-keyed aggregation builds paths (collect bounded by
    per-user activity); variants group by the path's md5 so the
    shuffle key is fixed-width (CLAUDE.md text-key rule), carrying one
    exemplar string via min(); top-k is TakeOrdered.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    paths = (ev.groupBy("user_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         "tus", "event_id", "event_type"))),
                     lambda s: s["event_type"]), ">").alias("path")))
    variants = (paths.groupBy(F.unhex(F.md5("path")).alias("k"))
                .agg(F.count(F.lit(1)).alias("n_users"),
                     F.min("path").alias("variant")))
    return (variants
            .orderBy(F.col("n_users").desc(), F.col("variant").asc())
            .limit(_VARIANT_TOPK)
            .select("variant",
                    F.col("n_users").cast("long").alias("n_users")))


_VARIANT_SQL = f"""
WITH paths AS (
    SELECT user_id,
           array_to_string(list_transform(
               list_sort(list(struct_pack(tus := epoch_us(ts),
                                          eid := event_id,
                                          et := event_type))),
               s -> s.et), '>') AS path
    FROM events GROUP BY user_id
),
variants AS (
    SELECT unhex(md5(path)) AS k, count(*) AS n_users,
           min(path) AS variant
    FROM paths GROUP BY 1
)
SELECT variant, CAST(n_users AS BIGINT) AS n_users
FROM variants
ORDER BY n_users DESC, variant ASC
LIMIT {_VARIANT_TOPK}
"""


# --------------------------------------------------------------------------
# Bottleneck transition latency
# --------------------------------------------------------------------------
def bottleneck_transition_latency(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Where does time pool? Per directly-follows edge (frm → nxt),
    the move count, exact mean gap, and exact median gap in
    microseconds — the bottleneck table a process owner reads before
    optimizing a step.

    Determinism: gaps from the (ts, event_id)-ordered lead; the mean
    is an integer div; the median is the exact lower order statistic
    (rank ceil(n/2)) with (gap, user_id) tie-break — never an engine
    percentile.

    Scale: one user-keyed window pass; the rank window partitions per
    EDGE (|types|² partitions); output is edge-bounded.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    moves = (ev.select(
        "user_id", F.col("event_type").alias("frm"),
        F.lead("event_type").over(w).alias("nxt"),
        (F.lead("tus").over(w) - F.col("tus")).alias("gap_us"))
        .where(F.col("nxt").isNotNull()))
    we = Window.partitionBy("frm", "nxt").orderBy(
        F.col("gap_us").asc(), F.col("user_id").asc())
    wn = Window.partitionBy("frm", "nxt")
    ranked = moves.select(
        "frm", "nxt", "gap_us",
        F.row_number().over(we).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"))
    med = (ranked.where(F.col("rk") == F.expr("(n + 1) div 2"))
           .select("frm", "nxt", F.col("gap_us").alias("p50_us")))
    agg = (moves.groupBy("frm", "nxt")
           .agg(F.count(F.lit(1)).alias("n_moves"),
                F.expr("sum(gap_us) div count(1)").alias("mean_us")))
    return (agg.join(F.broadcast(med), ["frm", "nxt"])
            .select("frm", "nxt",
                    F.col("n_moves").cast("long").alias("n_moves"),
                    F.col("mean_us").cast("long").alias("mean_us"),
                    F.col("p50_us").cast("long").alias("p50_us")))


_BOTTLENECK_SQL = """
WITH moves AS (
    SELECT user_id, event_type AS frm,
           lead(event_type) OVER w AS nxt,
           lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
clean AS (SELECT * FROM moves WHERE nxt IS NOT NULL),
ranked AS (
    SELECT frm, nxt, gap_us,
           row_number() OVER (PARTITION BY frm, nxt
               ORDER BY gap_us ASC, user_id ASC) AS rk,
           count(*) OVER (PARTITION BY frm, nxt) AS n
    FROM clean
),
med AS (
    SELECT frm, nxt, gap_us AS p50_us
    FROM ranked WHERE rk = (n + 1) // 2
),
agg AS (
    SELECT frm, nxt, count(*) AS n_moves,
           sum(gap_us) // count(*) AS mean_us
    FROM clean GROUP BY frm, nxt
)
SELECT a.frm, a.nxt,
       CAST(a.n_moves AS BIGINT) AS n_moves,
       CAST(a.mean_us AS BIGINT) AS mean_us,
       CAST(m.p50_us AS BIGINT) AS p50_us
FROM agg a JOIN med m ON a.frm = m.frm AND a.nxt = m.nxt
"""


QUERIES["conformance_fitness"] = (conformance_fitness, _conformance_sql())
QUERIES["process_variant_topk"] = (process_variant_topk, _VARIANT_SQL)
QUERIES["bottleneck_transition_latency"] = (
    bottleneck_transition_latency, _BOTTLENECK_SQL)
