"""SRC-18: warehouse catalog bootstrap.

The reference initializes its 19-table Postgres star schema by replaying
`ddl/data_sync_db.sql` statement-by-statement with `# FULL` gating and
trigger-body un-escaping (`alma_publish_to_database.py:339-383`,
`ddl/fix_ddl.py:38-103`). Here the warehouse is the Spark catalog:
tables are declared once as column specs and created with
`spark.sql('CREATE TABLE ... USING parquet')`. Grants/sequences/triggers
have no Spark analog (surrogate ids: `monotonically_increasing_id`,
OP-J11; delete history: explicit union, OP-ST6).

Scale design: each spec carries the clustering key the 100 TB layout
would bucket/partition by — the same keys the reference b-tree-indexes
(`ddl/data_sync_db.sql:393-415`). Bucketing the three big tables
(item, item_data, item_base_status — all keyed by pid) identically makes
the item_info 6-way join shuffle-free on the probe side; Parquet
min/max + partition pruning replace the remaining indexes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

AUDIT = [("create_date_time", "timestamp_ntz"),
         ("update_date_time", "timestamp_ntz"),
         ("version", "bigint")]
SYS_AUDIT = [("system_create_date_time", "timestamp_ntz"),
             ("system_update_date_time", "timestamp_ntz")]


def _cols(*pairs, audit=True, sys=False):
    out = list(pairs)
    if audit:
        out += AUDIT
    if sys:
        out += SYS_AUDIT
    return out


# table -> (columns, cluster_key) mirroring ddl/data_sync_db.sql:46-343.
# cluster_key = the key the table is bucketed/sorted by at scale (the
# reference's PK / hottest index).
WAREHOUSE_TABLES: dict[str, tuple[list[tuple[str, str]], list[str]]] = {
    "bib_brief": (_cols(
        ("mms_id", "string"), ("title", "string"), ("author", "string"),
        ("publication_date", "string"), ("publisher", "string"),
        ("publication_place", "string"), ("extent", "string"),
        ("material", "string"), ("isbn", "string"), ("issn", "string"),
        ("oclc_number", "string"), ("voyager_bib_id", "string"),
        ("leader", "string"), ("field008", "string"),
        ("suppress", "string"), sys=True), ["mms_id"]),
    "bib_marc": (_cols(("mms_id", "string"), ("raw_marc", "binary")),
                 ["mms_id"]),
    "bib_marc_xml": (_cols(("mms_id", "string"), ("marc_xml", "string")),
                     ["mms_id"]),
    "bib_part": (_cols(("mms_id", "string"), ("part_mms_id", "string"),
                       audit=False), ["mms_id"]),
    "holding_brief": (_cols(
        ("holding_id", "string"), ("mms_id", "string"),
        ("location_id", "bigint"), ("display_call_number", "string"),
        ("call_number_type", "string"), ("encoding_level", "string"),
        ("field007", "string"), ("field008", "string"),
        ("record_status", "string"), ("record_type", "string"),
        ("suppress", "string"), ("voyager_holding_id", "string"),
        sys=True), ["holding_id"]),
    "holding_marc": (_cols(("holding_id", "string"), ("raw_marc", "binary")),
                     ["holding_id"]),
    "item": (_cols(
        ("pid", "string"), ("holding_id", "string"), ("barcode", "string"),
        ("sequence_number", "int"), ("perm_location_id", "bigint"),
        ("temp_location_id", "bigint"), ("inventory_date_time", "timestamp_ntz"),
        ("item_enum", "string"), ("chron", "string"), ("pieces", "string"),
        ("material_type", "string"), ("policy", "string"),
        ("copy_id", "string"), ("description", "string"),
        ("voyager_item_id", "string"), sys=True), ["pid"]),
    "item_base_status": (_cols(
        ("pid", "string"), ("status_code", "string"),
        ("process_type", "string"), ("process_status", "string"),
        ("loan_date", "timestamp_ntz"), ("due_date", "timestamp_ntz"),
        ("renewal_date", "timestamp_ntz")), ["pid"]),
    "item_data": (_cols(("pid", "string"), ("data", "string")), ["pid"]),
    "library": (_cols(
        ("code", "string"), ("name", "string"), ("description", "string"),
        ("alma_id", "string"), ("campus", "string"),
        ("campus_description", "string"), ("path", "string")), ["code"]),
    "location": (_cols(
        ("id", "bigint"), ("code", "string"), ("library_code", "string"),
        ("name", "string"), ("external_name", "string"),
        ("suppress", "string")), ["id"]),
    "circ_desk": (_cols(
        ("id", "bigint"), ("code", "string"), ("name", "string"),
        ("library_code", "string"), ("primary_desk", "boolean"),
        ("reading_room_desk", "boolean")), ["id"]),
    "location_circ_desk": (_cols(
        ("circ_desk_id", "bigint"), ("location_id", "bigint"),
        audit=False), ["location_id"]),
    "code_table_value": (_cols(
        ("id", "bigint"), ("code", "string"), ("code_table", "string"),
        ("description", "string")), ["code_table", "code"]),
    "deleted_record": (_cols(
        ("id", "bigint"), ("record_type", "string"), ("mms_id", "string"),
        ("record_id", "string")), ["record_id"]),
    "record_update": (_cols(
        ("id", "bigint"), ("record_id", "string"), ("record_type", "string"),
        ("notification_date_time", "timestamp_ntz"),
        ("modified_by", "string"), audit=False)
        + [("create_date_time", "timestamp_ntz")], ["record_id"]),
    "external_id": (_cols(
        ("id", "bigint"), ("record_id", "string"), ("record_type", "string"),
        ("external_id_type", "string"), ("external_value", "string"),
        audit=False) + [("create_date_time", "timestamp_ntz")],
        ["external_value"]),
    "request_event": (_cols(
        ("request_id", "string"), ("mms_id", "string"),
        ("holding_id", "string"), ("pid", "string"), ("barcode", "string"),
        ("volume", "string"), ("part", "string"), ("issue", "string"),
        ("material_type", "string"), ("request_event", "string"),
        ("request_type", "string"), ("request_sub_type", "string"),
        ("request_status", "string"), ("comment", "string"),
        ("managed_by_library_code", "string"),
        ("managed_by_circulation_desk_code", "string"),
        ("place_in_queue", "int"), ("task_name", "string"),
        ("pickup_location", "string"), ("pickup_location_type", "string"),
        ("pickup_location_library", "string"),
        ("request_date", "timestamp_ntz"), ("expiry_date", "timestamp_ntz"),
        ("last_interest_date", "timestamp_ntz"),
        ("notification_date_time", "timestamp_ntz"), audit=False)
        + [("create_date_time", "timestamp_ntz")], ["pid"]),
    "record_set": (_cols(
        ("id", "bigint"), ("alma_id", "string"), ("name", "string"),
        ("set_json", "string"), audit=False), ["id"]),
    "user_details": (_cols(
        ("id", "bigint"), ("username", "string"), ("password", "string"),
        ("role", "string"), ("enabled", "boolean"),
        ("account_non_expired", "boolean"),
        ("account_non_locked", "boolean"),
        ("credentials_non_expired", "boolean")), ["id"]),
}


# The tables big enough at 100 TB to bucket (facts + their satellites).
# Dimensions stay unbucketed — they're broadcast, never shuffled.
BUCKETED_TABLES = ("item", "item_base_status", "item_data", "holding_brief",
                   "holding_marc", "bib_brief", "bib_marc", "bib_marc_xml",
                   "request_event")


def ddl_statements(database: str = "datasync",
                   location: str | None = None,
                   buckets: int = 0) -> list[str]:
    """CREATE statements for the full warehouse. Parquet-backed managed
    tables; `location` pins an explicit warehouse dir for tests.

    With ``buckets`` > 0 the big tables are CLUSTERED BY their key: the
    three pid-keyed satellites share bucket key AND count, so the
    item_info probe-side joins are exchange-free (bucketed scan feeds
    SortMergeJoin directly — see tests/test_warehouse_ddl.py)."""
    loc = f" LOCATION '{location}/{{t}}'" if location else ""
    stmts = [f"CREATE DATABASE IF NOT EXISTS {database}"
             + (f" LOCATION '{location}'" if location else "")]
    for t, (cols, key) in WAREHOUSE_TABLES.items():
        col_sql = ", ".join(f"{n} {typ}" for n, typ in cols)
        bucket_sql = ""
        if buckets and t in BUCKETED_TABLES:
            k = ", ".join(key)
            bucket_sql = (f" CLUSTERED BY ({k}) SORTED BY ({k}) "
                          f"INTO {buckets} BUCKETS")
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {database}.{t} ({col_sql}) "
            f"USING parquet{bucket_sql}{loc.format(t=t)}")
    return stmts


def bootstrap_catalog(spark: SparkSession, database: str = "datasync",
                      location: str | None = None,
                      buckets: int = 0) -> list[str]:
    """Execute the DDL (idempotent — IF NOT EXISTS everywhere, like the
    reference's re-runnable init). Returns the created table names."""
    for stmt in ddl_statements(database, location, buckets):
        spark.sql(stmt)
    return [t.name for t in spark.catalog.listTables(database)]


def cluster_key(table: str) -> list[str]:
    return WAREHOUSE_TABLES[table][1]
