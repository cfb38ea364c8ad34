"""SRC-9: REST config source — Alma configuration API → dimension
DataFrames (libraries, locations, circ desks, code tables).

The reference fetches these driver-side and row-inserts them
(`alma_client.py:7-35`, `alma_config_to_database.py:40-155`); config
data is tiny (dozens–hundreds of rows), so the Spark-first shape is the
same: fetch on the driver (requests, paginated `limit=100&offset=`) and
`spark.createDataFrame` the result — these frames are the broadcast
sides of OP-J1 lookups, never distributed reads.

The HTTP layer is injectable (`fetcher`) so tests run against canned
payloads and air-gapped environments skip cleanly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

Fetcher = Callable[[str], dict]


def default_fetcher(base_url: str, token: str) -> Fetcher:
    """requests-backed GET with apikey auth (alma_client.py:34-35)."""
    import requests  # baked into the env; import here keeps it optional

    def get(uri: str) -> dict:
        resp = requests.get(
            f"{base_url}{uri}",
            headers={"Authorization": f"apikey {token}",
                     "accept": "application/json"})
        return resp.json()

    return get


LIBRARY_SCHEMA = StructType([
    StructField("code", StringType()), StructField("name", StringType()),
    StructField("alma_id", StringType()), StructField("path", StringType()),
    StructField("description", StringType()),
    StructField("campus", StringType()),
    StructField("campus_description", StringType()),
])

LOCATION_SCHEMA = StructType([
    StructField("code", StringType()),
    StructField("library_code", StringType()),
    StructField("external_name", StringType()),
    StructField("name", StringType()),
    StructField("suppress", StringType()),
])

CODE_TABLE_SCHEMA = StructType([
    StructField("code_table", StringType()),
    StructField("code", StringType()),
    StructField("description", StringType()),
])


def load_libraries(spark: SparkSession, fetch: Fetcher) -> DataFrame:
    """⇐ store_libraries (alma_config_to_database.py:66-81)."""
    payload = fetch("/conf/libraries/")
    rows = [{
        "code": lib["code"], "name": lib["name"], "alma_id": lib["id"],
        "path": lib["path"], "description": lib.get("description"),
        "campus": (lib.get("campus") or {}).get("value"),
        "campus_description": (lib.get("campus") or {}).get("description"),
    } for lib in payload.get("library", [])]
    return spark.createDataFrame(rows, LIBRARY_SCHEMA)


def load_locations(spark: SparkSession, fetch: Fetcher,
                   library_codes: list[str]) -> DataFrame:
    """⇐ store_locations (alma_config_to_database.py:83-97): per-library
    fetch; suppress flag derived like OP-P5."""
    rows = []
    for code in library_codes:
        payload = fetch(f"/conf/libraries/{code}/locations")
        for loc in payload.get("location", []):
            rows.append({
                "code": loc["code"], "library_code": code,
                "external_name": loc.get("external_name"),
                "name": loc.get("name"),
                "suppress": "N" if loc.get("suppress_from_publishing") == "false"
                            else "Y",
            })
    return spark.createDataFrame(rows, LOCATION_SCHEMA)


def load_code_table(spark: SparkSession, fetch: Fetcher, name: str) -> DataFrame:
    """⇐ store_code_tables: one code table → (code_table, code, desc)."""
    payload = fetch(f"/conf/code-tables/{name}")
    rows = [{"code_table": name, "code": r.get("code"),
             "description": r.get("description")}
            for r in payload.get("row", [])]
    return spark.createDataFrame(rows, CODE_TABLE_SCHEMA)


def load_sets_paged(fetch: Fetcher, page_size: int = 100) -> list[dict]:
    """⇐ load_sets pagination (alma_client.py:25-27; OP-S4): drain the
    sets API `limit/offset` pages until a short page."""
    out: list[dict] = []
    offset = 0
    while True:
        payload = fetch(f"/conf/sets?limit={page_size}&offset={offset}&set_origin=UI")
        batch = payload.get("set", [])
        out.extend(batch)
        if len(batch) < page_size:
            return out
        offset += page_size


def with_surrogate_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    """OP-J11 replacement: the reference re-SELECTs DB-generated ids
    after insert (alma_config_to_database.py:117-127); engine-side we
    mint deterministic surrogates instead — dense row numbers over the
    natural key order (stable across runs for identical input)."""
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in df.columns])
    return df.withColumn(id_col, F.row_number().over(w).cast(LongType()))
