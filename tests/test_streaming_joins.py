"""Stream-stream interval join (streaming/joins.py): streaming output
== batch output on the same rows, and incremental drains emit each
matched pair exactly once from the checkpointed join state."""

from __future__ import annotations

from datetime import datetime

from alma_publish_to_marc_spark.streaming.joins import attributed_pairs

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double")


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, src_dir, checkpoint, out_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    pairs = attributed_pairs(
        stream.filter("event_type = 'view'"),
        stream.filter("event_type = 'purchase'"))

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (pairs.writeStream.foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


ROWS1 = [
    # user 1: view 10:00 -> purchase 10:30 attributed; 11:30 outside 1 h
    (1, datetime(2024, 1, 1, 10, 0), 1, "view", 0.0),
    (2, datetime(2024, 1, 1, 10, 30), 1, "purchase", 9.0),
    (3, datetime(2024, 1, 1, 11, 30), 1, "purchase", 9.0),
    # user 2: purchase with no prior view; then view -> purchase pair
    (4, datetime(2024, 1, 1, 10, 10), 2, "purchase", 5.0),
    (5, datetime(2024, 1, 1, 10, 20), 2, "view", 0.0),
    (6, datetime(2024, 1, 1, 10, 40), 2, "purchase", 7.0),
    # cross-user must NOT join
    (7, datetime(2024, 1, 1, 10, 20), 3, "view", 0.0),
]
# second arrival: a LATE view (event time before rows already seen,
# within the 2 h view watermark) that matches user 1's 10:30 purchase
ROWS2 = [
    (8, datetime(2024, 1, 1, 10, 10), 1, "view", 0.0),
]


def _collect(spark, out_dir):
    return {tuple(r) for r in
            spark.read.parquet(out_dir)
            .select("view_id", "purchase_id", "latency_us").collect()}


def test_stream_equals_batch_and_incremental(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "ckpt")

    _write_events(spark, src, ROWS1)
    _drain(spark, src, ckpt, out)

    batch1 = spark.createDataFrame(ROWS1, EVENTS_SCHEMA)
    expected1 = {tuple(r) for r in attributed_pairs(
        batch1.filter("event_type = 'view'"),
        batch1.filter("event_type = 'purchase'"))
        .select("view_id", "purchase_id", "latency_us").collect()}
    assert _collect(spark, out) == expected1
    assert (1, 2, 30 * 60 * 1_000_000) in expected1
    assert (5, 6, 20 * 60 * 1_000_000) in expected1
    assert all(p != 3 and p != 4 for _, p, _l in expected1)

    # drain 2: late view joins the ALREADY-SEEN purchase exactly once
    _write_events(spark, src, ROWS2)
    _drain(spark, src, ckpt, out)

    got = _collect(spark, out)
    assert (8, 2, 20 * 60 * 1_000_000) in got
    # no duplicates of drain-1 pairs, no other additions
    assert got == expected1 | {(8, 2, 20 * 60 * 1_000_000)}
