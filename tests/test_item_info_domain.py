"""The real item_info view on hand-built warehouse entities: every join
branch, the as-of + HISTORY interaction, the three correlated counts,
and the README acceptance lookups."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

from alma_publish_to_marc_spark.plans import item_info_domain as V


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def view(spark):
    item = spark.createDataFrame([
        Row(pid="p1", holding_id="h1", perm_location_id=1,
            temp_location_id=2, barcode="B1", item_enum="v.1"),
        Row(pid="p2", holding_id="h1", perm_location_id=1,
            temp_location_id=None, barcode="B2", item_enum=None),
    ])
    ibs_schema = ("pid string, status_code string, process_type string, "
                  "process_status string, renewal_date timestamp, "
                  "loan_date timestamp, due_date timestamp, "
                  "update_date_time timestamp")
    ibs = spark.createDataFrame([
        ("p1", "0", "LOAN", None, None, None,
         ts("2024-05-01T00:00:00"), ts("2024-04-01T00:00:00")),
        ("p2", "1", None, None, None, None,
         None, ts("2024-04-02T00:00:00")),
    ], ibs_schema)
    idata = spark.createDataFrame([
        Row(pid="p1", data='{"holding_data":{"call_number_type":{"value":"0"}}}'),
        Row(pid="p2", data='{"holding_data":{}}'),
    ])
    location = spark.createDataFrame([
        Row(id=1, library_code="LIB1", code="LOC1"),
        Row(id=2, library_code="LIB1", code="TEMP"),
    ])
    hb = spark.createDataFrame([
        Row(holding_id="h1", mms_id="m1", display_call_number="QA76 .C48")])
    bb = spark.createDataFrame([
        Row(mms_id="m1", title="A title", author="Author, Ann")])
    ctv = spark.createDataFrame([
        Row(code_table="BaseStatus", code="0", description="Item not in place"),
        Row(code_table="BaseStatus", code="1", description="Item in place"),
        Row(code_table="ItemPolicy", code="0", description="red herring"),
    ])
    rq = spark.createDataFrame([
        # p1: older ACTIVE, newer HISTORY → as-of picks HISTORY row,
        # then filters it → NO request columns for p1 (view semantics)
        Row(request_id="r1", pid="p1", holding_id="h1", mms_id="m1",
            request_status="ACTIVE", request_type="HOLD",
            request_sub_type=None, request_event="CREATED",
            pickup_location_library="LIB1",
            notification_date_time=ts("2024-01-01T00:00:00"),
            request_date=ts("2024-01-01T00:00:00")),
        Row(request_id="r2", pid="p1", holding_id="h1", mms_id="m1",
            request_status="HISTORY", request_type="HOLD",
            request_sub_type=None, request_event="DONE",
            pickup_location_library="LIB1",
            notification_date_time=ts("2024-02-01T00:00:00"),
            request_date=ts("2024-01-15T00:00:00")),
        # p2: single ACTIVE → as-of keeps it
        Row(request_id="r3", pid="p2", holding_id="h1", mms_id="m1",
            request_status="ACTIVE", request_type="DIGITIZATION",
            request_sub_type="PARTIAL", request_event="CREATED",
            pickup_location_library="LIB2",
            notification_date_time=ts("2024-03-01T00:00:00"),
            request_date=ts("2024-03-01T00:00:00")),
        # holding-level (pid NULL) and bib-level (pid+holding NULL)
        Row(request_id="r4", pid=None, holding_id="h1", mms_id="m1",
            request_status="ACTIVE", request_type="HOLD",
            request_sub_type=None, request_event="CREATED",
            pickup_location_library="LIB1",
            notification_date_time=ts("2024-03-02T00:00:00"),
            request_date=ts("2024-03-02T00:00:00")),
        Row(request_id="r5", pid=None, holding_id=None, mms_id="m1",
            request_status="HISTORY", request_type="HOLD",
            request_sub_type=None, request_event="CREATED",
            pickup_location_library="LIB1",
            notification_date_time=ts("2024-03-03T00:00:00"),
            request_date=ts("2024-03-03T00:00:00")),
    ])
    df = V.item_info_view(item, ibs, idata, location, hb, bb, ctv, rq)
    return df


def test_join_fanout_and_dims(view):
    rows = {r["pid"]: r for r in view.collect()}
    assert set(rows) == {"p1", "p2"}
    r1, r2 = rows["p1"], rows["p2"]
    assert r1["perm_library_code"] == "LIB1" and r1["perm_location_code"] == "LOC1"
    assert r1["temp_location_code"] == "TEMP"
    assert r2["temp_location_code"] is None        # left join branch
    assert r1["status"] == "Item not in place"     # constant-filtered dim
    assert r2["status"] == "Item in place"
    assert r1["title"] == "A title"
    assert r1["display_call_number"] == "QA76 .C48"


def test_asof_history_interaction(view):
    rows = {r["pid"]: r for r in view.collect()}
    # p1's newest request is HISTORY → excluded after ranking
    assert rows["p1"]["request_id"] is None
    # p2's single ACTIVE request survives
    assert rows["p2"]["request_id"] == "r3"
    assert rows["p2"]["request_type"] == "DIGITIZATION"


def test_correlated_counts(view):
    rows = {r["pid"]: r for r in view.collect()}
    assert rows["p1"]["request_count"] == 1        # HISTORY excluded
    assert rows["p2"]["request_count"] == 1
    assert rows["p1"]["holding_level_request_count"] == 1   # r4
    assert rows["p1"]["bib_level_request_count"] == 0       # r5 is HISTORY


def test_acceptance_lookups(view):
    assert V.lookup_by_barcode(view, "B1").count() == 1
    assert V.lookup_by_mms_id(view, "m1").count() == 2
    cnt = {r["pid"]: r["call_number_type"]
           for r in V.call_number_type_from_json(view).collect()}
    assert cnt == {"p1": "0", "p2": None}
    assert V.items_in_location(view, "LIB1", "LOC1").count() == 2
