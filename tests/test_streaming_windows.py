"""Streaming windowed aggregation ≡ batch, and stateful running
counters accumulating across checkpointed drains."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.streaming import windows as W

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double")


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, src_dir, checkpoint, build, out_dir):
    """availableNow drain into an append-parquet foreachBatch sink (the
    memory sink cannot recover from a checkpoint across drains)."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir))

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (build(stream).writeStream
         .foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "events")
    rows = [
        (1, datetime(2024, 1, 1, 10, 5), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 55), 1, "click", 2.0),
        (3, datetime(2024, 1, 1, 11, 5), 2, "view", 3.0),
        (4, datetime(2024, 1, 1, 9, 59), 2, "view", 4.0),   # late, in watermark
    ]
    _write_events(spark, src, rows)

    out1 = str(tmp_path / "win_out")
    _drain(spark, src, str(tmp_path / "ck1"), W.windowed_event_counts, out1)
    got = {(r["window_start"].isoformat(), r["event_type"]): (r["n"], r["value_sum"])
           for r in spark.read.parquet(out1).collect()}

    batch = W.windowed_event_counts(spark.read.schema(EVENTS_SCHEMA).parquet(src))
    want = {(r["window_start"].isoformat(), r["event_type"]): (r["n"], r["value_sum"])
            for r in batch.collect()}
    assert got == want
    assert got[("2024-01-01T10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01T09:00:00", "view")] == (1, 4.0)


def test_stateful_running_counts_across_drains(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "events2")
    ck = str(tmp_path / "ck2")
    _write_events(spark, src, [
        (1, datetime(2024, 1, 1, 10), 7, "click", 1.0),
        (2, datetime(2024, 1, 1, 11), 7, "click", 1.0),
        (3, datetime(2024, 1, 1, 10), 8, "view", 1.0),
    ])
    out1 = str(tmp_path / "run_out1")
    _drain(spark, src, ck, W.running_user_counts, out1)
    got1 = {r["user_id"]: r["n_events"]
            for r in spark.read.parquet(out1).collect()}
    assert got1 == {7: 2, 8: 1}

    # second drain with NEW events only → state carries the old counts
    _write_events(spark, src, [
        (4, datetime(2024, 1, 2, 10), 7, "click", 1.0),
        (5, datetime(2024, 1, 2, 11), 9, "signup", 1.0),
    ])
    out2 = str(tmp_path / "run_out2")
    _drain(spark, src, ck, W.running_user_counts, out2)
    got2 = {r["user_id"]: r["n_events"]
            for r in spark.read.parquet(out2).collect()}
    # update-mode output only carries touched keys; user 7 accumulated
    assert got2[7] == 3
    assert got2[9] == 1
    assert 8 not in got2


def test_dedup_within_watermark_across_drains(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "events3")
    ck = str(tmp_path / "ck3")
    # drain 1: event 1 duplicated in-batch, plus event 2
    _write_events(spark, src, [
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 30), 2, "view", 2.0),
    ])
    out = str(tmp_path / "dedup_out")

    def build(stream):
        return W.deduped_event_stream(stream)

    def drain():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (build(stream).writeStream.foreachBatch(sink)
             .outputMode("append")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    ids1 = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids1 == [1, 2]

    # drain 2: event 2 re-arrives inside the watermark window (same ts)
    # plus a genuinely new event 3 — only 3 is emitted
    _write_events(spark, src, [
        (2, datetime(2024, 1, 1, 10, 30), 2, "view", 2.0),
        (3, datetime(2024, 1, 1, 11, 0), 3, "click", 3.0),
    ])
    drain()
    ids2 = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids2 == [1, 2, 3]

    # batch form degrades to plain dropDuplicates
    batch = W.deduped_event_stream(
        spark.read.schema(EVENTS_SCHEMA).parquet(src))
    assert sorted(r["event_id"] for r in batch.collect()) == [1, 2, 3]


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "ssj_events")
    rows = [
        # user 1: click at 10:00; purchases at 10:30 (in horizon) and
        # 12:00 (outside)
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 0.0),
        (2, datetime(2024, 1, 1, 10, 30), 1, "purchase", 9.5),
        (3, datetime(2024, 1, 1, 12, 0), 1, "purchase", 1.0),
        # user 2: purchase with no prior click
        (4, datetime(2024, 1, 1, 10, 15), 2, "purchase", 5.0),
        # user 3: click after the purchase -> no match
        (5, datetime(2024, 1, 1, 11, 0), 3, "purchase", 2.0),
        (6, datetime(2024, 1, 1, 11, 30), 3, "click", 0.0),
    ]
    _write_events(spark, src, rows)

    def build_stream(streaming_events):
        return W.attribution_interval_join(
            streaming_events.where(F.col("event_type") == "click"),
            streaming_events.where(F.col("event_type") == "purchase"))

    out = str(tmp_path / "ssj_out")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (build_stream(stream).writeStream
         .foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssj_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    batch_events = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    want = sorted(map(tuple, W.attribution_interval_join(
        batch_events.where(F.col("event_type") == "click"),
        batch_events.where(F.col("event_type") == "purchase")).collect()))
    assert got == want
    # exactly one attribution: user 1's 10:30 purchase to the 10:00 click
    assert len(got) == 1
    assert got[0][0] == 1 and got[0][3] == 2 and got[0][5] == 9.5


def test_transform_with_state_matches_batch_ewma(spark, tmp_path):
    """The transformWithStateInPandas feature server must agree with
    the batch event_ewma_features query: after draining all events,
    each user's served ewma equals the batch query's LAST row."""
    # the transformWithState channel serializes state over protobuf;
    # not installed in this container, runs anywhere it is (same env
    # gate as the real media codecs)
    pytest.importorskip("google.protobuf")
    from datetime import datetime, timedelta

    from alma_publish_to_marc_spark.plans import analytics_queries as A

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    src = str(tmp_path / "tws_events")
    base = datetime(2024, 1, 1, 9, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        for k in range(12):  # > EWMA_W so truncation is exercised
            eid += 1
            rows.append((eid, base + timedelta(minutes=10 * k + user),
                         user, "view", float(user * 100 + k)))
    # two chunks so state must carry across micro-batches
    _write_events(spark, src, rows[:10])
    _write_events(spark, src, rows[10:])

    out = str(tmp_path / "tws_out")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out)

    q = (W.recent_feature_stream(stream).writeStream
         .foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "tws_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    served = {}
    for r in spark.read.parquet(out).collect():
        # keep the latest emission per user (max n_events)
        if r["user_id"] not in served or r["n_events"] > served[r["user_id"]]["n_events"]:
            served[r["user_id"]] = r

    # write the same events under documents-free dir for the batch query
    batch = A._ewma_features.__wrapped__ if hasattr(A._ewma_features, "__wrapped__") \
        else A._ewma_features
    events_df = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    events_df.createOrReplaceTempView("_unused")
    # reuse the query body by pointing tables.load at a dir: simplest is
    # to write events.parquet into a fresh sf-style dir
    sf_dir = str(tmp_path / "sfdir")
    import os
    os.makedirs(sf_dir, exist_ok=True)
    events_df.coalesce(1).write.mode("overwrite").parquet(sf_dir + "/events.parquet")
    want_rows = batch(spark, sf_dir).collect()
    last_per_user = {}
    for r in want_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or (r["ts"], r["event_id"]) > (cur["ts"], cur["event_id"]):
            last_per_user[r["user_id"]] = r

    assert set(served) == set(last_per_user)
    for user, srow in served.items():
        assert srow["n_events"] == 12
        assert srow["ewma_value"] == pytest.approx(
            last_per_user[user]["ewma_value"], abs=1e-6)
