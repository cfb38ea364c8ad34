"""Unit tests for operators/relational.py on tiny hand-built frames —
edge cases the sf-scale oracle sweep can't isolate (tiebreaks, empty
sides, first-row semantics)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from alma_publish_to_marc_spark.operators import relational as R


def ts(s):
    return datetime.fromisoformat(s)


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame([
        Row(k="a", ts=ts("2024-01-01T00:00:00"), seq=1, v="old"),
        Row(k="a", ts=ts("2024-01-02T00:00:00"), seq=2, v="mid"),
        Row(k="a", ts=ts("2024-01-02T00:00:00"), seq=3, v="new"),  # ts collision
        Row(k="b", ts=ts("2024-01-01T00:00:00"), seq=1, v="only"),
    ])
    out = {r["k"]: r["v"] for r in
           R.latest_per_key(df, ["k"], "ts", ["seq"]).collect()}
    assert out == {"a": "new", "b": "only"}


def test_anti_join_deletes_and_semi(spark):
    stored = spark.createDataFrame([Row(id=1), Row(id=2), Row(id=3)])
    incoming = spark.createDataFrame([Row(id=2), Row(id=2)])  # dup keys ok
    gone = sorted(r["id"] for r in
                  R.anti_join_deletes(stored, incoming, ["id"]).collect())
    kept = sorted(r["id"] for r in R.semi_join(stored, incoming, ["id"]).collect())
    assert gone == [1, 3]
    assert kept == [2]


def test_replace_by_key(spark):
    stored = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)])
    batch = spark.createDataFrame([Row(k="a", v=9)])
    out = sorted((r["k"], r["v"]) for r in
                 R.replace_by_key(stored, batch, ["k"]).collect())
    # every stored row for key 'a' replaced by the single batch row
    assert out == [("a", 9), ("b", 3)]


def test_changed_rows_marks_first_row(spark):
    df = spark.createDataFrame([
        Row(k="u", seq=1, v="x"),
        Row(k="u", seq=2, v="x"),
        Row(k="u", seq=3, v="y"),
    ])
    out = {r["seq"]: r["changed"] for r in
           R.changed_rows(df, ["k"], "seq", "v").collect()}
    assert out == {1: True, 2: False, 3: True}


def test_first_per_group_deterministic_order(spark):
    df = spark.createDataFrame([
        Row(k="u", ord1=1, ord2=2, v="second"),
        Row(k="u", ord1=1, ord2=1, v="first"),
    ])
    out = R.first_per_group(df, ["k"], ["ord1", "ord2"]).collect()
    assert out[0]["v"] == "first"


def test_salted_join_equals_plain_join_under_hot_key(spark):
    # one hot key (90% of rows) + a key absent from the dim side
    skewed = spark.createDataFrame(
        [Row(suppkey=1, v=i) for i in range(90)]
        + [Row(suppkey=2, v=i) for i in range(9)]
        + [Row(suppkey=99, v=0)])
    dim = spark.createDataFrame([Row(suppkey=1, name="hot"),
                                 Row(suppkey=2, name="cold"),
                                 Row(suppkey=3, name="unused")])
    got = R.salted_join(skewed, dim, "suppkey", salt_buckets=4)
    plain = skewed.join(dim, "suppkey")
    assert got.count() == plain.count() == 99
    assert sorted(got.columns) == sorted(plain.columns)
    by_name = {r["name"]: r["count"] for r in
               got.groupBy("name").count().collect()}
    assert by_name == {"hot": 90, "cold": 9}
