"""End-to-end tests of the publish-record split (the reference's core
transform, alma_publish_parser.py:91-189, re-expressed in Catalyst)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.functions import marc as M
from alma_publish_to_marc_spark.plans.publish_split import split_publish
from alma_publish_to_marc_spark.schemas import PUBLISH_RECORD

from .fixtures_publish import ALL_RECORDS, HID_A, HID_B


@pytest.fixture(scope="module")
def split(spark):
    df = spark.createDataFrame(ALL_RECORDS, PUBLISH_RECORD)
    out = split_publish(df)
    return {k: v.collect() for k, v in out.items()}


def test_counts_and_dedup(split):
    # 2 copies of the good bib dedup to 1; both bad records error out
    assert len(split["bibs"]) == 1
    assert len(split["holdings"]) == 2
    assert len(split["items"]) == 3
    assert len(split["errors"]) == 2


def test_error_reasons(split):
    errs = {e["mms_id"]: e["error"] for e in split["errors"]}
    assert "holding count" in errs["9920008651"]
    assert "sanity" in errs["9930008651"]


def test_bib_001_first_and_fields_relocated(split):
    bib = split["bibs"][0]
    assert bib["mms_id"] == "9910008651"
    assert bib["control_fields"][0]["tag"] == "001"
    # holding control groups removed from the bib
    assert [c["tag"] for c in bib["control_fields"]] == ["001", "005", "008"]
    tags = [f["tag"] for f in bib["fields"]]
    assert "852" not in tags and "866" not in tags and "ITM" not in tags
    assert bib["holding_ids"] == [HID_A, HID_B]


def test_holding_synthesis_dual_009(split):
    h = {r["holding_id"]: r for r in split["holdings"]}[HID_A]
    assert h["mms_id"] == "9910008651"
    assert h["leader"] == "00000nx  a22000001n 4500"
    ctags = [c["tag"] for c in h["control_fields"]]
    assert ctags == ["001", "004", "005", "007", "008"]
    assert h["control_fields"][0]["data"] == HID_A
    assert h["control_fields"][1]["data"] == "9910008651"
    # 007 carries the 002 data; 008 carries the 003 data
    assert h["control_fields"][3]["data"] == "ta"
    # original voyager id 1234567 → 035 provenance + relocated 852/866
    ftags = [f["tag"] for f in h["fields"]]
    assert ftags == ["035", "852", "866"]
    assert h["fields"][0]["subfields"][0]["value"] == "(CtY)1234567-yaledb-Voyager"
    # institution $8 stripped from relocated fields
    codes_852 = [s["code"] for s in h["fields"][1]["subfields"]]
    assert "8" not in codes_852


def test_holding_synthesis_leader_only(split):
    h = {r["holding_id"]: r for r in split["holdings"]}[HID_B]
    assert h["leader"] == "00000nx  a22000002n 4500"
    ctags = [c["tag"] for c in h["control_fields"]]
    assert ctags == ["001", "004", "005", "008"]  # no 035, no 007
    assert [f["tag"] for f in h["fields"]] == ["852"]


def test_item_structs(split):
    items = {i["pid"]: i for i in split["items"]}
    assert set(items) == {"23111118651", "23111128651", "23111138651"}
    i1 = items["23111118651"]
    assert i1["holding_id"] == HID_A
    assert i1["barcode"] == "BARCODE1"
    assert i1["library"] == "LIB1" and i1["location"] == "LOC1"
    assert i1["in_temp_location"] is False      # perm == current
    assert i1["enumeration_a"] == "v.1" and i1["chronology_i"] == "2020"
    i2 = items["23111128651"]
    assert i2["in_temp_location"] is True       # LOC1 != TEMPLOC
    i3 = items["23111138651"]
    assert i3["in_temp_location"] is False      # all null → equal → false


def test_brief_extraction_rules(spark):
    df = spark.createDataFrame(ALL_RECORDS, PUBLISH_RECORD)
    bibs = split_publish(df)["bibs"]
    row = bibs.select(
        M.extract_title(F.col("fields")).alias("title"),
        M.extract_author(F.col("fields")).alias("author"),
        M.extract_publisher(F.col("fields")).alias("publisher"),
        M.extract_publication_date(F.col("fields")).alias("pub_date"),
        M.extract_isbns(F.col("fields")).alias("isbns"),
        M.extract_oclcs(F.col("fields")).alias("oclcs"),
        M.extract_voyager_or_sierra_id(F.col("fields")).alias("sierra"),
        M.first_fixed_field(F.col("control_fields"), "008").alias("f008"),
        M.extract_system_dates(F.col("fields"), "BIB").alias("dates"),
    ).collect()[0]
    assert row["title"] == "A title : ignored part one"  # 245 abp, trailing . stripped
    assert row["author"] == "Author, Ann"               # $0 excluded, trailing , stripped
    assert row["publisher"] == "Pub House"
    # trailing period after digits is kept (trim rule only fires after a
    # ≥3-letter word — marc/helper.py:9)
    assert row["pub_date"] == "2020."
    # 020 with $z skipped; first len>=13 promoted to front
    assert row["isbns"] == ["9781234567897", "0987654321"]
    assert row["oclcs"] == ["(OCoLC)123456789"]
    assert row["sierra"] == "b12345678"                 # (CtY-L) prefix, last char dropped
    assert row["f008"].startswith("200101s2020")
    assert row["dates"]["create_raw"].startswith("2020-01-01")


def _fields_df(spark, fields):
    from .fixtures_publish import GOOD_RECORD
    rec = dict(GOOD_RECORD)
    rec["fields"] = fields
    return spark.createDataFrame([rec], PUBLISH_RECORD)


def test_extract_isbns_keeps_duplicate_best(spark):
    """Reference pops only the FIRST occurrence of the best ISBN
    (marc/helper.py:116-127 uses values.index) — duplicates survive."""
    from .fixtures_publish import df_, sf
    fields = [df_("020", " ", " ", sf("a", "111"), sf("a", "9781234567897"),
                  sf("a", "9781234567897"))]
    row = _fields_df(spark, fields).select(
        M.extract_isbns(F.col("fields")).alias("isbns")).collect()[0]
    assert row["isbns"] == ["9781234567897", "111", "9781234567897"]


def test_library_location_requires_both_codes_in_one_field(spark):
    """Reference takes (b, c) from the first 852 having BOTH; fields
    with only $b (or only $c) must not contribute half a pair
    (marc/helper.py:106-113)."""
    from .fixtures_publish import df_, sf
    fields = [
        df_("852", "0", " ", sf("b", "LIBONLY")),            # skipped
        df_("852", "0", " ", sf("c", "LOCONLY")),            # skipped
        df_("852", "0", " ", sf("b", "LIB1"), sf("b", "LIB2"),
            sf("c", "LOC1")),                                 # wins; first $b
    ]
    row = _fields_df(spark, fields).select(
        M.extract_library_location(F.col("fields")).alias("ll")).collect()[0]
    assert row["ll"]["library_code"] == "LIB1"
    assert row["ll"]["location_code"] == "LOC1"

    none_row = _fields_df(spark, [df_("852", "0", " ", sf("b", "X"))]).select(
        M.extract_library_location(F.col("fields")).alias("ll")).collect()[0]
    assert none_row["ll"]["library_code"] is None
    assert none_row["ll"]["location_code"] is None


def test_extract_system_dates_scans_past_fields_without_create(spark):
    """Reference loops fields of the tag until one has $1 — a first field
    lacking $1 must not shadow a later valid one (marc/helper.py:150-155)."""
    from .fixtures_publish import df_, sf
    fields = [
        df_("BIB", " ", " ", sf("a", "false")),  # no $1
        df_("BIB", " ", " ", sf("1", "2021-02-03 04:05:06"),
            sf("2", "2022-03-04 05:06:07")),
    ]
    row = _fields_df(spark, fields).select(
        M.extract_system_dates(F.col("fields"), "BIB").alias("d")).collect()[0]
    assert row["d"]["create_raw"] == "2021-02-03 04:05:06"
    assert row["d"]["update_raw"] == "2022-03-04 05:06:07"
