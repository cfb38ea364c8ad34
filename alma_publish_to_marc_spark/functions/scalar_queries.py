"""Oracle-checked scalar-function queries (SURVEY.md §2.8).

The reference's scalar library operates on MARC strings; here each
function runs over deterministic dirty strings synthesized from the
driver tables (both engines build the identical input in-query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import scalars as SC


# --- OP-F1/F5/P10: string cleanup ----------------------------------------
def _string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty input: '[<prefix>  <src> ;:' — exercises bracket strip,
    whitespace collapse, fixpoint trailing-punct removal, null-norm."""
    docs = load(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("["), F.substring("text", 1, 40),
                     F.lit("  "), F.col("source"), F.lit(" ;:"))
    return docs.select(
        "doc_id",
        SC.trim_punctuation_bounded(SC.rm_ws(dirty)).alias("cleaned"),
        SC.presence(F.when(F.col("doc_id") % 10 == 0, F.lit(""))
                    .otherwise(F.col("source"))).alias("source_norm"),
        SC.truncate254(F.col("text")).alias("text_trunc"),
    )


# bounded fixpoint: unroll the same regex passes the Spark side applies.
def _cleanup_sql() -> str:
    dirty = "'[' || substr(text, 1, 40) || '  ' || source || ' ;:'"
    expr = f"regexp_replace({dirty}, ' +', ' ', 'g')"
    for _ in range(8):
        expr = f"regexp_replace({expr}, ' *[,/;:] *$', '')"
    for _ in range(8):
        expr = rf"regexp_replace({expr}, '( *[^\W\d]{{3,}})\.$', '\1')"
    expr = rf"regexp_replace({expr}, '^\[?([^\[\]]+)\]?$', '\1')"
    expr = f"trim({expr})"
    expr = f"CASE WHEN {expr} = '.' THEN '' ELSE {expr} END"
    return f"""
SELECT doc_id,
       {expr} AS cleaned,
       nullif(CASE WHEN doc_id % 10 = 0 THEN '' ELSE source END, '') AS source_norm,
       substr(text, 1, 254) AS text_trunc
FROM documents
"""


# --- OP-F3/F4: identifier normalization ----------------------------------
def _id_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCLC ids padded to 6/9/11 digits by event_id%3 → exercises the
    ocm/ocn/on branches; ISSN-ish strings keep digits and dashes."""
    events = load(spark, sf_dir, "events")
    padded = F.when(F.col("event_id") % 3 == 0,
                    F.lpad(F.col("event_id").cast("string"), 6, "0")) \
              .when(F.col("event_id") % 3 == 1,
                    F.lpad(F.col("event_id").cast("string"), 9, "0")) \
              .otherwise(F.lpad(F.col("event_id").cast("string"), 11, "0"))
    raw_oclc = F.concat(F.lit("(OCoLC)"), padded)
    raw_issn = F.concat(F.lit("ISSN 12x4-"), F.lpad(F.col("event_id") % 10000, 4, "0"))
    return events.select(
        "event_id",
        SC.format_oclc(raw_oclc).alias("oclc"),
        SC.is_oclc_number(raw_oclc).alias("is_oclc"),
        SC.format_number_dashes(raw_issn).alias("issn"),
    )


_ID_NORMALIZE_SQL = """
WITH raw AS (
    SELECT event_id,
           '(OCoLC)' || (CASE
               WHEN event_id % 3 = 0 THEN lpad(CAST(event_id AS VARCHAR), 6, '0')
               WHEN event_id % 3 = 1 THEN lpad(CAST(event_id AS VARCHAR), 9, '0')
               ELSE lpad(CAST(event_id AS VARCHAR), 11, '0') END) AS raw_oclc,
           'ISSN 12x4-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') AS raw_issn
    FROM events
),
d AS (SELECT event_id, raw_oclc, raw_issn,
             regexp_replace(raw_oclc, '\\D', '', 'g') AS digits FROM raw)
SELECT event_id,
       CASE WHEN length(digits) <= 8 THEN 'ocm' || digits
            WHEN length(digits) = 9 THEN 'ocn' || digits
            ELSE 'on' || digits END AS oclc,
       (starts_with(lower(raw_oclc), '(ocolc)') OR starts_with(lower(raw_oclc), 'oc')) AS is_oclc,
       regexp_replace(raw_issn, '[^0-9-]', '', 'g') AS issn
FROM d
"""


# --- OP-F9/OP-F10: JSON path extraction --------------------------------------
def _json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    k = SC.json_value(F.col("props"), "$.k").cast("int")
    return (events
            .select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.sum(F.col("k").cast("long")).alias("k_sum"),
                 F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
                 F.max("k").alias("k_max")))


_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(k AS BIGINT)) AS BIGINT) AS k_sum,
       count(CASE WHEN k > 50 THEN 1 END) AS n_high,
       max(k) AS k_max
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
GROUP BY event_type
"""


# --- OP-F11: XPath over XML column ----------------------------------------
def _xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML synthesized from columns (as bib_marc_xml stores MARC XML);
    Spark extracts with the real xpath builtin — the oracle, lacking
    XPath, parses the same document with a regexp."""
    docs = load(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<record><datafield tag="AVE"><subfield code="o">'),
        F.col("source"),
        F.lit('</subfield></datafield><datafield tag="852"><subfield code="h">'),
        F.col("lang"),
        F.lit("</subfield></datafield></record>"),
    )
    return docs.select(
        "doc_id",
        SC.xpath_first(xml, '/record/datafield[@tag="AVE"]/subfield[@code="o"]')
          .alias("ave_o"),
        SC.xpath_first(xml, '/record/datafield[@tag="852"]/subfield[@code="h"]')
          .alias("call_h"),
    )


_XPATH_SQL = """
WITH x AS (
    SELECT doc_id,
           '<record><datafield tag="AVE"><subfield code="o">' || source ||
           '</subfield></datafield><datafield tag="852"><subfield code="h">' || lang ||
           '</subfield></datafield></record>' AS xml
    FROM documents
)
SELECT doc_id,
       regexp_extract(xml, 'tag="AVE"><subfield code="o">([^<]*)</subfield>', 1) AS ave_o,
       regexp_extract(xml, 'tag="852"><subfield code="h">([^<]*)</subfield>', 1) AS call_h
FROM x
"""


# --- OP-F6: date parse with timezone-alias ---------------------------------
def _tz_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date strings synthesized from events.ts; half carry a 'US/Eastern'
    suffix that must shift the parse to UTC — the reference's alias
    normalization (marc/helper.py:161-166). Spark runs the real DST-aware
    parse_date_tz_alias (to_utc_timestamp America/New_York); rows are
    restricted to Dec/Jan/Feb where that zone is firmly EST (+5h), which a
    fixed-interval DuckDB oracle can model without ICU. Summer/EDT behavior
    is unit-tested."""
    events = load(spark, sf_dir, "events").where(
        F.month("ts").isin(12, 1, 2))
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    tagged = F.when(F.col("event_id") % 2 == 0, F.concat(s, F.lit(" US/Eastern"))) \
              .otherwise(s)
    parsed = SC.parse_date_tz_alias(tagged)
    return events.select("event_id", parsed.cast("timestamp_ntz").alias("parsed_ts"))


# Winter months only (Dec/Jan/Feb): America/New_York is firmly on EST (UTC-5)
# there, so the DST-aware to_utc_timestamp path in parse_date_tz_alias equals
# this portable fixed '+ INTERVAL 5 HOUR' oracle; summer (EDT, +4h) behavior
# is covered by unit tests, which DuckDB's non-ICU build can't model.
_TZ_DATE_SQL = """
WITH s AS (
    SELECT event_id,
           CASE WHEN event_id % 2 = 0
                THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || ' US/Eastern'
                ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw
    FROM events
    WHERE month(ts) IN (12, 1, 2)
)
SELECT event_id,
       CASE WHEN contains(raw, 'US/Eastern')
            THEN strptime(trim(replace(raw, 'US/Eastern', '')),
                          '%Y-%m-%d %H:%M:%S') + INTERVAL 5 HOUR
            ELSE strptime(raw, '%Y-%m-%d %H:%M:%S') END AS parsed_ts
FROM s
"""


# --- OP-P5/P8/P10/F13: flag derivation + prefix classify -------------------
def _flags_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    marker = F.when(F.col("doc_id") % 3 == 0,
                    F.concat(F.lit("(OCoLC)"), F.col("doc_id").cast("string"))) \
              .when(F.col("doc_id") % 3 == 1,
                    F.concat(F.lit("oc"), F.col("doc_id").cast("string"))) \
              .otherwise(F.concat(F.lit("id:"), F.col("doc_id").cast("string")))
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        SC.suppress_flag(F.when(F.col("lang") == "en", F.lit("false"))
                         .otherwise(F.lit("true"))).alias("suppress"),
        SC.is_oclc_number(marker).alias("is_oclc"),
        SC.remove_prefix(marker, "(OCoLC)").alias("stripped"),
    )


_FLAGS_SQL = """
WITH m AS (
    SELECT doc_id, lang,
           CASE WHEN doc_id % 3 = 0 THEN '(OCoLC)' || CAST(doc_id AS VARCHAR)
                WHEN doc_id % 3 = 1 THEN 'oc' || CAST(doc_id AS VARCHAR)
                ELSE 'id:' || CAST(doc_id AS VARCHAR) END AS marker
    FROM documents
)
SELECT doc_id,
       upper(lang) AS lang_uc,
       CASE WHEN (CASE WHEN lang = 'en' THEN 'false' ELSE 'true' END) <> 'false'
            THEN 'Y' ELSE 'N' END AS suppress,
       (starts_with(lower(marker), '(ocolc)') OR starts_with(lower(marker), 'oc')) AS is_oclc,
       regexp_replace(marker, '^\\(OCoLC\\)', '') AS stripped
FROM m
"""


def _blob_printable(spark, sf_dir):
    """⇐ OP-F12 bytea escape decode (`encode(raw_marc,'escape')`,
    README.md:69): human-readable views of a binary column — base64,
    hex, and UTF-8 printable decode. The binary is derived
    deterministically from the text column (first 24 ASCII chars) so
    the byte-level results are oracle-checkable; on real MARC blobs the
    same three expressions apply unchanged. Pure scan-speed column
    ops, zero shuffles."""
    from pyspark.sql import functions as F

    from ..tables import load

    docs = load(spark, sf_dir, "documents")
    bin_col = F.substring("text", 1, 24).cast("binary")
    return docs.select(
        "doc_id",
        F.base64(bin_col).alias("b64"),
        F.lower(F.hex(bin_col)).alias("hx"),
        bin_col.cast("string").alias("printable"),
        F.length(bin_col).alias("n_bytes"),
    )


_BLOB_SQL = """
SELECT doc_id,
       base64(encode(substr(text, 1, 24))) AS b64,
       lower(hex(encode(substr(text, 1, 24)))) AS hx,
       substr(text, 1, 24) AS printable,
       CAST(octet_length(encode(substr(text, 1, 24))) AS INT) AS n_bytes
FROM documents
"""


QUERIES = {
    "string_cleanup": (_string_cleanup, _cleanup_sql()),
    "id_normalize": (_id_normalize, _ID_NORMALIZE_SQL),
    "json_path_extract": (_json_extract, _JSON_SQL),
    "xpath_extract": (_xpath_extract, _XPATH_SQL),
    "tz_date_parse": (_tz_date_parse, _TZ_DATE_SQL),
    "flags_and_classify": (_flags_classify, _FLAGS_SQL),
    "blob_printable": (_blob_printable, _BLOB_SQL),
}


def _sql_udf_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL user-defined functions (CREATE TEMPORARY FUNCTION
    ... RETURN <expr>): the catalog-level reuse surface for scalar
    logic — unlike Python UDFs these inline into Catalyst (codegen,
    pushdown) so a shared business rule costs nothing at 100 TB. A
    price-banding rule and an exact-cents helper are defined as SQL
    UDFs and used in one aggregation; the oracle inlines the same
    expressions.

    Determinism: the banding is a pure CASE over exact cents.
    Scale: scan-fused; the UDFs vanish at plan time (no Python
    worker, no serialization boundary).
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(c BIGINT) "
        "RETURNS STRING RETURN CASE WHEN c < 5000000 THEN 'low' "
        "WHEN c < 15000000 THEN 'mid' ELSE 'high' END")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_udf_orders")
    return spark.sql("""
        SELECT price_band(order_cents(o_totalprice)) AS band,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(order_cents(o_totalprice)) AS BIGINT)
                   AS total_cents
        FROM _udf_orders
        GROUP BY 1
    """)


_SQL_UDF_SQL = """
WITH o AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
)
SELECT CASE WHEN c < 5000000 THEN 'low'
            WHEN c < 15000000 THEN 'mid' ELSE 'high' END AS band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(c) AS BIGINT) AS total_cents
FROM o
GROUP BY 1
"""

QUERIES["sql_udf_banding"] = (_sql_udf_banding, _SQL_UDF_SQL)


def _parameterized_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers, Spark 3.4+): the
    injection-safe way to ship user-tunable literals into a SQL text —
    parameters bind as LITERALS in the parsed plan, so constant
    folding and partition pruning see them exactly like hard-coded
    values (verify with .explain: the filter shows the bound
    literal). The oracle inlines the same constants.

    Scale: scan-fused filter + aggregation; binding adds nothing.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM _param_orders
        WHERE o_totalprice >= :min_total AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_total": 50_000.0, "status": "O"})


_PARAM_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""

QUERIES["parameterized_sql_report"] = (_parameterized_sql_report, _PARAM_SQL)


# --------------------------------------------------------------------------
# Spark 4 collation surface: case-insensitive grouping via UTF8_LCASE
# --------------------------------------------------------------------------

def _collated_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: group documents by source under the
    UTF8_LCASE collation — the engine-level case-insensitive semantics
    that replaces ad-hoc lower() wrapping. The input deliberately
    mixes case (even doc_ids upper-cased) so the collated grouping has
    real work to do; the emitted key is the canonical lower form
    (identical for every member of a collated group), the DuckDB twin
    groups by lower() — same partition function, so counts match
    bit-for-bit.

    Scale: one keyed aggregate; the collated group key hashes on the
    collation key (lowercased bytes for UTF8_LCASE), so the shuffle
    behaves exactly like the lower() form at any scale.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
         .otherwise(F.col("source")).alias("src_mixed"))
    return (docs.groupBy(F.expr("collate(src_mixed, 'UTF8_LCASE')")
                         .alias("ci"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(F.lower("src_mixed")).alias("source_canonical"))
            .select("source_canonical", "n_docs"))


_COLLATED_SQL = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
             AS src_mixed
  FROM documents
)
SELECT min(lower(src_mixed)) AS source_canonical,
       CAST(count(*) AS BIGINT) AS n_docs
FROM docs
GROUP BY lower(src_mixed)
"""

QUERIES["collated_group_counts"] = (_collated_group_counts, _COLLATED_SQL)
