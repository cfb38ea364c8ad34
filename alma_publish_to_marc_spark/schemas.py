"""Declared StructTypes for the engine (no schema inference anywhere).

- PUBLISH_RECORD: one Alma publish MARC record *before* splitting —
  control fields + data fields as ordered nested arrays (order is
  semantically load-bearing: group extraction and 852↔control-group
  zipping depend on it; Spark arrays preserve order).
  Shape per /root/reference/alma_publish_parser.py:91-189 and
  FIXTURES.md §1.
- ITEM_STRUCT: typed replacement for the reference's JSON string
  templating (`item-template.json`; built by `field_to_item_json`,
  alma_publish_parser.py:251-275). Placeholders become real nulls.
- Warehouse entity schemas per /root/reference/ddl/data_sync_db.sql.
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampNTZType)

SUBFIELD = StructType([
    StructField("code", StringType()),
    StructField("value", StringType()),
])

CONTROL_FIELD = StructType([
    StructField("tag", StringType()),
    StructField("data", StringType()),
])

DATA_FIELD = StructType([
    StructField("tag", StringType()),
    StructField("ind1", StringType()),
    StructField("ind2", StringType()),
    StructField("subfields", ArrayType(SUBFIELD)),
])

PUBLISH_RECORD = StructType([
    StructField("mms_id", StringType()),
    StructField("leader", StringType()),
    StructField("control_fields", ArrayType(CONTROL_FIELD)),
    StructField("fields", ArrayType(DATA_FIELD)),
    StructField("source_file", StringType()),
])

# Holding record synthesized by the split (alma_publish_parser.py:113-149):
HOLDING_RECORD = StructType([
    StructField("holding_id", StringType()),
    StructField("mms_id", StringType()),
    StructField("leader", StringType()),
    StructField("control_fields", ArrayType(CONTROL_FIELD)),
    StructField("fields", ArrayType(DATA_FIELD)),
])

# Typed item (replaces JSON-template splice; field ↔ subfield-code map from
# item-template.json — e.g. pid=<$2>, barcode=<$1>, library=<$h>.value).
ITEM_STRUCT = StructType([
    StructField("mms_id", StringType()),
    StructField("holding_id", StringType()),        # <$0>
    StructField("pid", StringType()),               # <$2>
    StructField("barcode", StringType()),           # <$1>
    StructField("policy", StringType()),            # <$c>
    StructField("description", StringType()),       # <$g>
    StructField("library", StringType()),           # <$h>
    StructField("location", StringType()),          # <$s>
    StructField("pieces", StringType()),            # <$3>
    StructField("creation_date", StringType()),     # <$w>
    StructField("modification_date", StringType()), # <$r>
    StructField("inventory_date", StringType()),    # <$z>
    StructField("inventory_number", StringType()),  # <$m>
    StructField("base_status", StringType()),       # <$x>
    StructField("physical_material_type", StringType()),  # <$4>
    StructField("enumeration_a", StringType()),     # <$e>
    StructField("chronology_i", StringType()),      # <$f>
    StructField("process_type", StringType()),      # <$6>
    StructField("copy_id", StringType()),           # <$b> (holding_data)
    StructField("temp_library", StringType()),      # <$i>
    StructField("temp_location", StringType()),     # <$t>
    StructField("in_temp_location", BooleanType()),
    StructField("call_number", StringType()),       # <$o>
    StructField("call_number_type", StringType()),  # <$j>
])

# --- warehouse entity schemas (ddl/data_sync_db.sql:46-343) ---------------
AUDIT_COLS = [
    StructField("create_date_time", TimestampNTZType()),
    StructField("update_date_time", TimestampNTZType()),
    StructField("version", LongType()),
]

BIB_BRIEF = StructType([
    StructField("mms_id", StringType()),
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("publication_date", StringType()),
    StructField("publication_place", StringType()),
    StructField("publisher", StringType()),
    StructField("system_create_date_time", TimestampNTZType()),
    StructField("system_update_date_time", TimestampNTZType()),
    StructField("field008", StringType()),
    StructField("extent", StringType()),
    StructField("material", StringType()),
    StructField("leader", StringType()),
    StructField("issn", StringType()),
    StructField("isbn", StringType()),
    StructField("oclc_number", StringType()),
    StructField("voyager_bib_id", StringType()),
    StructField("suppress", StringType()),
    *AUDIT_COLS,
])

HOLDING_BRIEF = StructType([
    StructField("holding_id", StringType()),
    StructField("mms_id", StringType()),
    StructField("display_call_number", StringType()),
    StructField("location_id", LongType()),
    StructField("system_create_date_time", TimestampNTZType()),
    StructField("system_update_date_time", TimestampNTZType()),
    StructField("field008", StringType()),
    StructField("voyager_holding_id", StringType()),
    StructField("suppress", StringType()),
    *AUDIT_COLS,
])

ITEM = StructType([
    StructField("pid", StringType()),
    StructField("holding_id", StringType()),
    StructField("perm_location_id", LongType()),
    StructField("temp_location_id", LongType()),
    StructField("sequence_number", IntegerType()),
    StructField("item_enum", StringType()),
    StructField("chron", StringType()),
    StructField("barcode", StringType()),
    StructField("material_type", StringType()),
    StructField("pieces", StringType()),
    StructField("copy_id", StringType()),
    StructField("policy", StringType()),
    StructField("description", StringType()),
    StructField("inventory_date_time", TimestampNTZType()),
    StructField("voyager_item_id", StringType()),
    StructField("system_create_date_time", TimestampNTZType()),
    StructField("system_update_date_time", TimestampNTZType()),
    *AUDIT_COLS,
])

ITEM_BASE_STATUS = StructType([
    StructField("pid", StringType()),
    StructField("status_code", StringType()),
    StructField("process_type", StringType()),
    StructField("process_status", StringType()),
    StructField("due_date", TimestampNTZType()),
    StructField("loan_date", TimestampNTZType()),
    StructField("renewal_date", TimestampNTZType()),
    *AUDIT_COLS,
])

LOCATION = StructType([
    StructField("id", LongType()),
    StructField("code", StringType()),
    StructField("library_code", StringType()),
    StructField("external_name", StringType()),
    StructField("name", StringType()),
    StructField("suppress", StringType()),
    *AUDIT_COLS,
])

DELETED_RECORD = StructType([
    StructField("id", LongType()),
    StructField("record_type", StringType()),  # bib | holding | item
    StructField("mms_id", StringType()),
    StructField("record_id", StringType()),
    *AUDIT_COLS,
])

ERROR_RECORD = StructType([
    StructField("mms_id", StringType()),
    StructField("source_file", StringType()),
    StructField("error", StringType()),
])
