"""Oracle-checked entry for the event-time window operator
(streaming/windows.py). `windowed_event_counts` is one code path for
both modes — here it runs in batch over the events table, so the DuckDB
oracle (time_bucket) checks the exact same aggregation the streaming
query executes per micro-batch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


QUERIES = {
    "event_time_windows": (_event_time_windows, _WINDOWS_SQL),
}
