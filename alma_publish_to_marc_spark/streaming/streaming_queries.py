"""Oracle-checked entry for the event-time window operator
(streaming/windows.py). `windowed_event_counts` is one code path for
both modes — here it runs in batch over the events table, so the DuckDB
oracle (time_bucket) checks the exact same aggregation the streaming
query executes per micro-batch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .windows import windowed_event_counts


def _event_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(load(spark, sf_dir, "events"))


_WINDOWS_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2, 3
"""


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session) via
    Spark's native session_window — merge-on-overlap, usable identically
    in batch and streaming. One shuffle on user_id; at 100 TB the state
    store handles the streaming variant with watermark eviction."""
    from pyspark.sql import functions as F

    events = load(spark, sf_dir, "events")
    return (events
            .groupBy("user_id",
                     F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "value_sum"))


_SESSION_SQL = """
WITH g AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS value_sum
FROM s GROUP BY user_id, sid
"""


def _hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) event-time windows — 1-hour windows every 30
    minutes, so each event lands in exactly 2 windows. Same
    batch≡streaming code path as the tumbling query (F.window with a
    slideDuration); the oracle materializes the 2 covering windows per
    event via unnest. One shuffle keyed by (window, type); streaming
    state per window expires at the watermark like the tumbling case.
    """
    from pyspark.sql import functions as F

    events = load(spark, sf_dir, "events")
    return (events
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_sum"))


_HOPPING_SQL = """
WITH covering AS (
    SELECT time_bucket(INTERVAL 30 MINUTE, ts)
               - INTERVAL 30 MINUTE * i AS window_start,
           event_type, value
    FROM events, unnest(generate_series(0, 1)) AS t(i)
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM covering
GROUP BY 1, 2, 3
"""


QUERIES = {
    "event_time_windows": (_event_time_windows, _WINDOWS_SQL),
    "event_sessionization": (_sessionize, _SESSION_SQL),
    "hopping_window_counts": (_hopping_windows, _HOPPING_SQL),
}


# ---------------------------------------------------------------------------
# Watermark late-data audit (batch replay of streaming drop semantics)
# ---------------------------------------------------------------------------
_WM_DELAY_US = 300_000_000  # 5-minute watermark


def _watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay streaming watermark semantics over the batch log: per
    channel (event type), process events in ARRIVAL order (event_id —
    the ingest sequence), track the running max event time over
    strictly-preceding arrivals, and flag an event late when it
    arrives more than the 5-minute watermark behind that high-water
    mark — exactly the rows `withWatermark(...)` would drop. The audit
    sizes the allowed-lateness knob BEFORE a streaming deploy.

    Integer epoch-µs arithmetic throughout; the exclusive-preceding
    frame makes the first arrival NULL-safe (never late).

    Scale: one window per channel keyed on event_type (streams are
    per-source sequential by construction, so this matches the real
    ingest partitioning); the report is channel-sized."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    w = (Window.partitionBy("event_type").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.select(
        "event_type", "tus",
        (F.max("tus").over(w) - F.col("tus")).alias("behind_us"))
    late = F.col("behind_us") > _WM_DELAY_US
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(late, 1).otherwise(0)).cast("long")
                  .alias("n_late"),
                 F.max(F.when(late, F.col("behind_us"))).alias("max_late_us")))


_WM_SQL = f"""
WITH flagged AS (
  SELECT event_type,
         max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
             - epoch_us(ts) AS behind_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN behind_us > {_WM_DELAY_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       max(CASE WHEN behind_us > {_WM_DELAY_US} THEN behind_us END)
           AS max_late_us
FROM flagged GROUP BY 1
"""

QUERIES["watermark_late_audit"] = (_watermark_late_audit, _WM_SQL)


# --------------------------------------------------------------------------
# stream_interval_join: view→purchase attribution pairs + per-purchase agg
# --------------------------------------------------------------------------


def _stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase attribution summary over the stream-stream interval
    join (streaming/joins.py): for every purchase, how many views by
    the same user preceded it within 1 hour, and the freshest / stalest
    view latency. The pair generation is the ONE code path that runs
    identically on streaming inputs with watermark-bounded state
    (test_streaming_joins.py proves stream ≡ batch on the same rows);
    this batch entry lets the DuckDB oracle value-check it.

    Determinism: counts and integer-microsecond latencies only.
    Scale: the join shuffles both filtered streams on user_id once;
    the per-purchase aggregate is map-side combinable on the pair
    output, which the range bound keeps to (views/hour/user) per
    purchase, not all history.
    """
    from .joins import attributed_pairs

    ev = load(spark, sf_dir, "events")
    pairs = attributed_pairs(ev.filter(F.col("event_type") == "view"),
                             ev.filter(F.col("event_type") == "purchase"))
    return (pairs.groupBy("user_id", "purchase_id")
            .agg(F.count(F.lit(1)).alias("n_views_1h"),
                 F.min("latency_us").alias("min_latency_us"),
                 F.max("latency_us").alias("max_latency_us")))


_INTERVAL_JOIN_SQL = """
SELECT v.user_id, p.event_id AS purchase_id,
       CAST(count(*) AS BIGINT) AS n_views_1h,
       min(epoch_us(p.ts) - epoch_us(v.ts)) AS min_latency_us,
       max(epoch_us(p.ts) - epoch_us(v.ts)) AS max_latency_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY 1, 2
"""

QUERIES["stream_interval_join"] = (_stream_interval_join,
                                   _INTERVAL_JOIN_SQL)
