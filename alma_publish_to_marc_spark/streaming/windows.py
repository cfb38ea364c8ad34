"""Event-time streaming operators (beyond the reference, which has no
event-time windows — SURVEY.md §2.9 note): tumbling-window aggregation
with watermarked late-data handling, and a custom stateful operator via
applyInPandasWithState (running per-key counters that survive across
micro-batches and restarts through the state store).

These give the engine the streaming-analytics surface a training-data
pipeline needs (rate monitoring, incremental per-source counters)
while staying exactly-once under checkpointing."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows with a watermark: counts and value
    sums per (window, event_type). Works identically on a batch frame
    (watermark is a no-op) — tests pin streaming == batch."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.window("ts", window).alias("w"),
                        F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_sum"))


RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("last_ts", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
])


def _update_running(key: tuple, batches: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    last_ts = None
    for pdf in batches:
        n += len(pdf)
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "last_ts": [last_ts]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user event
    counters accumulated across micro-batches; the state store (under
    the query checkpoint) carries them across restarts."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


def deduped_event_stream(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup by event_id — the across-restart
    form of OP-A2/OP-ST4 (the batch form is a plain ``dropDuplicates``
    inside each micro-batch). ``dropDuplicatesWithinWatermark`` keys
    the state store by event_id and EXPIRES entries once the watermark
    passes them, so dedup state is bounded by (arrival rate × watermark
    horizon) instead of growing with the corpus — the property that
    keeps this runnable forever on a cluster. Duplicates are only
    guaranteed caught while inside the watermark window, which matches
    the reference's per-run dedup contract (its set state also reset
    per run; SURVEY.md OP-A2)."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def attribution_interval_join(clicks: DataFrame, purchases: DataFrame,
                              watermark: str = "2 hours",
                              horizon_minutes: int = 60) -> DataFrame:
    """Stream-stream event-time INTERVAL join — the attribution shape:
    each purchase joins the clicks of the same user that happened at
    most ``horizon_minutes`` before it.

    This is the streaming join class the rest of the surface lacked
    (windowed aggs, dedup, sessionization, stateful counters are
    covered elsewhere): both sides are watermarked, and the join
    condition carries the event-time bound, so Spark can expire
    buffered state — a click is held for at most
    watermark + horizon, purchases for the watermark. Without the
    interval bound the state store would grow without limit; with it,
    state per user is O(events inside the horizon).

    Works identically on batch frames (watermarks are a no-op), which
    is what the test pins: stream drain == batch join, row for row.
    """
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(F.col("user_id"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
    p = purchases.select(F.col("user_id").alias("p_user_id"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
    return (c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts")
           + F.expr(f"INTERVAL {horizon_minutes} MINUTES")))
        .select("user_id", "click_id", "click_ts",
                "purchase_id", "purchase_ts", "purchase_value"))


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class RecentFeatureProcessor(StatefulProcessor):
    """Spark 4 ``transformWithStateInPandas`` processor: per-user
    last-N feature state. Keeps a bounded ListState of the most recent
    ``EWMA_W`` (ts, value) pairs plus a ValueState event counter, and
    on every micro-batch emits the user's windowed EWMA — the exact
    streaming twin of the batch ``event_ewma_features`` query (same
    ALPHA/W constants, same renormalized alpha^j weights), so the
    serving path and the backfill path compute the same feature.

    State is O(W) per user by construction (the list is truncated on
    every update), and the new-API state store gives TTL/timers for
    free if eviction is ever needed — this is the Spark-4 replacement
    for the applyInPandasWithState counter above."""

    def init(self, handle) -> None:
        self._recent = handle.getListState("recent", "ts timestamp, value double")
        self._count = handle.getValueState("n", "n bigint")

    def close(self) -> None:
        pass

    def handleInputRows(self, key, rows, timer_values):
        from ..plans.analytics_queries import EWMA_ALPHA, EWMA_W

        new = pd.concat(list(rows), ignore_index=True)
        new = new.sort_values(["ts", "event_id"])
        hist = [(r[0], r[1]) for r in self._recent.get()]
        hist += list(zip(new["ts"], new["value"]))
        # a LATE event in batch N+1 must interleave by event time, not
        # arrival: without the sort, stored-then-new ordering regresses
        # last_ts and mis-weights the alpha^j lags, diverging from the
        # batch query's (ts-ordered) result. Python sort is stable, so
        # same-ts events keep arrival order (the batch tie-break is
        # event_id, which state doesn't carry — equal-ts ties are the
        # documented residual approximation).
        hist.sort(key=lambda tv: tv[0])
        hist = hist[-EWMA_W:]
        self._recent.clear()
        self._recent.put([(t, float(v)) for t, v in hist])
        n = (self._count.get()[0] if self._count.exists() else 0) + len(new)
        self._count.update((n,))
        num = den = 0.0
        for j, (_, v) in enumerate(reversed(hist)):
            w = EWMA_ALPHA ** j
            num += v * w
            den += w
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts": [hist[-1][0]],
            "ewma_value": [round(num / den, 6)],
        })


RECENT_FEATURES_SCHEMA = ("user_id long, n_events bigint, "
                          "last_ts timestamp, ewma_value double")


def recent_feature_stream(events: DataFrame) -> DataFrame:
    """Wire the processor over a (streaming or batch-test) events
    frame; grouping key is user_id, update-mode output."""
    return (events.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RecentFeatureProcessor(),
                outputStructType=RECENT_FEATURES_SCHEMA,
                outputMode="Update",
                timeMode="None"))
