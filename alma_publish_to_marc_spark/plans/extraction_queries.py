"""Oracle-checked queries for the full MARC extraction rule set
(OP-P1..P3, OP-F1/F7, OP-S2/S3, the id extractors), the typed item-JSON
round-trip (OP-F8/F9/F14), the ISO-2709 size guard (OP-P9), and two
beyond-reference analytics operators Spark gives for free (ROLLUP,
running-window frames).

Input records are synthesized in-query from the TPC-H stand-ins so the
DuckDB oracle can compute every expected value directly from the source
columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import marc as M
from ..functions.sql_oracles import sql_trim_punctuation
from ..tables import load


# --------------------------------------------------------------------------
# marc_field_extraction: every brief-extraction rule at once
# --------------------------------------------------------------------------
def _synth_marc_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")

    def s(code, value):
        return F.struct(F.lit(code).alias("code"), value.alias("value"))

    def fld(tag, ind2, subs):
        return F.struct(F.lit(tag).alias("tag"), F.lit(" ").alias("ind1"),
                        F.lit(ind2).alias("ind2"), subs.alias("subfields"))

    key = F.col("p_partkey").cast("string")
    size = F.col("p_size").cast("string")
    fields = F.array(
        fld("245", "0", F.array(
            s("a", F.concat(F.col("p_name"), F.lit(" :"))),
            s("b", F.col("p_brand")),
            s("p", F.concat(F.lit("part "), size)))),
        fld("100", " ", F.array(
            s("a", F.concat(F.lit("Author, "), F.col("p_brand"), F.lit(","))),
            s("0", F.lit("auth-id")))),
        fld("260", " ", F.array(
            s("a", F.lit("New Haven :")),
            s("b", F.concat(F.col("p_type"), F.lit(","))),
            s("c", F.concat(size, F.lit("."))))),
        fld("264", "1", F.array(
            s("b", F.concat(F.lit("Pub"), F.col("p_brand"))),
            s("c", F.concat(F.lit("c"), size)))),
        fld("752", " ", F.array(s("a", F.concat(F.lit("Place"), size)))),
        fld("020", " ", F.array(s("a", F.lit("0000000000")),
                                s("z", F.lit("dud")))),
        fld("020", " ", F.array(
            s("a", F.concat(F.lit("01234"), key)),
            s("a", F.concat(F.lit("978000000"), F.lpad(key, 4, "0"))))),
        fld("022", " ", F.array(s("a", F.concat(F.lit("1234-"), F.lpad(key, 4, "0"))))),
        fld("035", " ", F.array(s("a", F.concat(F.lit("(OCoLC)"), key)))),
        fld("079", " ", F.array(s("a", F.concat(F.lit("ocm"), key)),
                                s("z", F.lit("cancelled")))),
        fld("035", " ", F.array(s("a", F.concat(F.lit("(CtY-L)b"), key, F.lit("x"))))),
        fld("300", " ", F.array(s("a", F.concat(F.lit("xx, "), size, F.lit(" p."))),
                                s("c", F.lit("24 cm")),
                                s("b", F.lit("ill.")))),
        fld("340", " ", F.array(s("a", F.lit("paper")))),
        fld("852", " ", F.array(s("k", F.lit("Oversize")),
                                s("h", F.concat(F.lit("QA"), size)),
                                s("i", F.lit(".B5")))),
    )
    control = F.array(
        F.struct(F.lit("001").alias("tag"), key.alias("data")),
        F.struct(F.lit("008").alias("tag"),
                 F.concat(F.lit("fixed"), key).alias("data")),
    )
    return part.select(key.alias("mms_id"), control.alias("control_fields"),
                       fields.alias("fields"))


def _marc_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    recs = _synth_marc_fields(spark, sf_dir)
    fields = F.col("fields")
    return recs.select(
        "mms_id",
        M.extract_title(fields).alias("title"),
        M.extract_author(fields).alias("author"),
        M.extract_publication_date(fields).alias("publication_date"),
        M.extract_publisher(fields).alias("publisher"),
        M.extract_publication_place(fields).alias("publication_place"),
        M.extract_extent(fields).alias("extent"),
        M.extract_material(fields).alias("material"),
        M.extract_call_number(fields).alias("call_number"),
        F.try_element_at(M.extract_isbns(fields), F.lit(1)).alias("isbn"),
        F.try_element_at(M.extract_issns(fields), F.lit(1)).alias("issn"),
        F.try_element_at(M.extract_oclcs(fields), F.lit(1)).alias("oclc"),
        M.extract_voyager_or_sierra_id(fields).alias("voyager_id"),
        M.first_fixed_field(F.col("control_fields"), "008").alias("field008"),
    )


def _marc_extraction_sql() -> str:
    t = sql_trim_punctuation
    key = "CAST(p_partkey AS VARCHAR)"
    size = "CAST(p_size AS VARCHAR)"
    return f"""
SELECT {key} AS mms_id,
       {t(f"p_name || ' : ' || p_brand || ' part ' || {size}")} AS title,
       {t("'Author, ' || p_brand || ','")} AS author,
       substr({t(f"{size} || '. c' || {size}")}, 1, 254) AS publication_date,
       {t("p_type || ', Pub' || p_brand")} AS publisher,
       {t(f"'New Haven : Place' || {size}")} AS publication_place,
       'xx, ' || {size} || ' p. 24 cm' AS extent,
       'ill. paper' AS material,
       {t(f"'Oversize QA' || {size} || ' .B5'")} AS call_number,
       '978000000' || lpad({key}, 4, '0') AS isbn,
       '1234-' || lpad({key}, 4, '0') AS issn,
       '(OCoLC)' || {key} AS oclc,
       'b' || {key} AS voyager_id,
       'fixed' || {key} AS field008
FROM part
"""


# --------------------------------------------------------------------------
# item_json_roundtrip: typed struct → JSON column → path extraction
# --------------------------------------------------------------------------
def _item_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-F8 (typed struct replaces string templating; JSON escaping via
    to_json = OP-F14) then OP-F9/F10 read-back with defaulting
    (base_status defaults '1', alma_publish_to_database.py:289)."""
    li = load(spark, sf_dir, "lineitem")
    data = F.to_json(F.struct(
        F.struct(F.concat(F.lit("99"), F.col("l_orderkey").cast("string"))
                 .alias("mms_id")).alias("bib_data"),
        F.struct(
            F.concat(F.lit("22"), F.col("l_orderkey").cast("string"))
             .alias("holding_id"),
            (F.col("l_linenumber") % 2 == 0).alias("in_temp_location"),
        ).alias("holding_data"),
        F.struct(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("pid"),
            F.col("l_partkey").cast("string").alias("barcode"),
            F.when(F.col("l_linenumber") % 3 == 0,
                   F.struct(F.lit("0").alias("value")))
             .alias("base_status"),
        ).alias("item_data"),
    ))
    with_json = li.select(data.alias("data"))
    return with_json.select(
        F.get_json_object("data", "$.item_data.pid").alias("pid"),
        F.get_json_object("data", "$.bib_data.mms_id").alias("mms_id"),
        F.get_json_object("data", "$.holding_data.holding_id").alias("holding_id"),
        F.get_json_object("data", "$.item_data.barcode").alias("barcode"),
        F.coalesce(F.get_json_object("data", "$.item_data.base_status.value"),
                   F.lit("1")).alias("status_code"),
        (F.get_json_object("data", "$.holding_data.in_temp_location") == "true")
        .alias("in_temp"),
    )


_ITEM_JSON_SQL = """
SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS pid,
       '99' || CAST(l_orderkey AS VARCHAR) AS mms_id,
       '22' || CAST(l_orderkey AS VARCHAR) AS holding_id,
       CAST(l_partkey AS VARCHAR) AS barcode,
       CASE WHEN l_linenumber % 3 = 0 THEN '0' ELSE '1' END AS status_code,
       (l_linenumber % 2 = 0) AS in_temp
FROM lineitem
"""


# --------------------------------------------------------------------------
# marc_size_guard: OP-P9 — serialize, drop BIB on overflow, skip if still big
# --------------------------------------------------------------------------
def _size_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 5th record carries an oversized 909 field pushing it past
    the 99,999-byte ISO-2709 cap; the BIB field's padding decides whether
    dropping it (the reference's retry, alma_publish_to_database.py:
    176-184) rescues the record."""
    from ..sources.publish import apply_size_guard

    cust = load(spark, sf_dir, "customer")

    def s(code, value):
        return F.struct(F.lit(code).alias("code"), value.alias("value"))

    def fld(tag, subs):
        return F.struct(F.lit(tag).alias("tag"), F.lit(" ").alias("ind1"),
                        F.lit(" ").alias("ind2"), subs.alias("subfields"))

    key = F.col("c_custkey").cast("string")
    mms = F.concat(F.lit("99"), key)
    pad = F.repeat(F.lit("x"), (200 + (F.col("c_custkey") % 400) * 2).cast("int"))
    # ISO-2709 directory length slots are 4 digits → keep every field
    # ≤9999 bytes and vary the COUNT of big fields instead: 13 → even
    # BIB-dropping can't rescue (skipped), 12 → dropping BIB rescues.
    big = F.repeat(F.lit("y"), 8300)
    n909 = (F.when(F.col("c_custkey") % 10 == 0, F.lit(13))
            .when(F.col("c_custkey") % 5 == 0, F.lit(12))
            .otherwise(F.lit(0)))
    base_fields = F.array(
        fld("245", F.array(s("a", F.col("c_name")))),
        fld("BIB", F.array(s("a", F.lit("false")), s("9", pad))),
    )
    # slice of a repeated array: sequence(1,0) would yield [1,0], not []
    f909s = F.slice(F.array_repeat(fld("909", F.array(s("a", big))), 13),
                    F.lit(1), n909)
    fields = F.concat(base_fields, f909s)
    records = cust.select(
        mms.alias("mms_id"),
        F.lit("00000cam a2200000 a 4500").alias("leader"),
        F.array(F.struct(F.lit("001").alias("tag"), mms.alias("data")))
         .alias("control_fields"),
        fields.alias("fields"),
        F.lit("synthetic.xml").alias("source_file"),
    )
    return apply_size_guard(records).select("mms_id", "action", "n_bytes")


def _size_guard_sql() -> str:
    # ISO-2709 byte math (ASCII data): 24 leader + 12/field directory +
    # 1 FT + body + 1 RT; control field body = len+1; data field body =
    # 2 indicators + Σ(1 US + 1 code + len(value)) + 1 FT.
    key = "CAST(c_custkey AS VARCHAR)"
    mms = f"'99' || {key}"
    return f"""
WITH sizes AS (
    SELECT {mms} AS mms_id,
           CASE WHEN c_custkey % 10 = 0 THEN 13
                WHEN c_custkey % 5 = 0 THEN 12 ELSE 0 END AS n909,
           length({mms}) + 1 AS ctrl_body,
           2 + (2 + length(c_name)) + 1 AS f245,
           2 + (2 + 5) + (2 + 200 + (c_custkey % 400) * 2) + 1 AS fbib,
           2 + (2 + 8300) + 1 AS f909
    FROM customer
),
t AS (
    SELECT mms_id,
           -- with BIB: directory entries = 001 + 245 + BIB + n909
           24 + 12 * (3 + n909) + 1
              + ctrl_body + f245 + fbib + n909 * f909 + 1 AS full_len,
           -- without BIB
           24 + 12 * (2 + n909) + 1
              + ctrl_body + f245 + n909 * f909 + 1 AS nobib_len
    FROM sizes
)
SELECT mms_id,
       CASE WHEN full_len <= 99999 THEN 'kept'
            WHEN nobib_len <= 99999 THEN 'bib_dropped'
            ELSE 'skipped' END AS action,
       CASE WHEN full_len <= 99999 THEN full_len
            WHEN nobib_len <= 99999 THEN nobib_len END AS n_bytes
FROM t
"""


# --------------------------------------------------------------------------
# beyond-reference: ROLLUP and running-window frames (free in Spark)
# --------------------------------------------------------------------------
def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (orders
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .rollup(F.col("n_name").alias("nation_name"),
                    F.col("o_orderstatus").alias("status"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


_ROLLUP_SQL = """
SELECT n.n_name AS nation_name, o.o_orderstatus AS status,
       count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, o.o_orderstatus)
"""


def _running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.row_number().over(
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")).alias("order_seq"),
    )


_RUNNING_SQL = """
SELECT o_custkey AS c_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total,
       CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
           AS order_seq
FROM orders
"""


def _cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.cube(F.col("l_returnflag").alias("returnflag"),
                    F.col("l_linestatus").alias("linestatus"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")))


_CUBE_SQL = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (one shuffle;
    Spark sorts within each hash partition — no global sort). At 100 TB
    swap to percentile_approx (t-digest, mergeable map-side sketch) when
    exactness can be traded for a single-pass bound."""
    events = load(spark, sf_dir, "events")
    return (events.groupBy("event_type")
            .agg(*[F.round(F.expr(f"percentile(value, {p})"), 4)
                   .alias(f"p{int(p * 100)}") for p in (0.5, 0.9, 0.99)],
                 F.count(F.lit(1)).alias("n")))


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
"""


def _iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence anomaly detection per event type — the monitoring
    filter that flags value outliers before they pollute training
    features: fences at Q1/Q3 ± 1.5·IQR, reporting per-type fence
    bounds and outlier counts/share.

    Scale: one percentile aggregation to #types rows (exact here;
    percentile_approx at 100 TB), broadcast back onto the scan for the
    fence test — the events table never reshuffles for the flagging
    pass, and the output is #types rows."""
    events = load(spark, sf_dir, "events")
    fences = (events.groupBy("event_type")
              .agg(F.expr("percentile(value, 0.25)").alias("q1"),
                   F.expr("percentile(value, 0.75)").alias("q3"))
              .select("event_type", "q1", "q3",
                      (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
                      .alias("lo_fence"),
                      (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
                      .alias("hi_fence")))
    flagged = (events.join(F.broadcast(fences), "event_type")
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.when((F.col("value") < F.col("lo_fence"))
                                 | (F.col("value") > F.col("hi_fence")), 1)
                          .otherwise(0)).alias("n_outliers")))
    return (flagged.join(fences, "event_type")
            .select("event_type", "n",
                    F.col("n_outliers").cast("long").alias("n_outliers"),
                    F.round(F.col("n_outliers") / F.col("n"), 4)
                     .alias("outlier_share"),
                    F.round("lo_fence", 4).alias("lo_fence"),
                    F.round("hi_fence", 4).alias("hi_fence")))


_IQR_SQL = """
WITH fences AS (
    SELECT event_type,
           quantile_cont(value, 0.25) AS q1,
           quantile_cont(value, 0.75) AS q3
    FROM events GROUP BY event_type
),
f AS (
    SELECT event_type,
           q1 - 1.5 * (q3 - q1) AS lo_fence,
           q3 + 1.5 * (q3 - q1) AS hi_fence
    FROM fences
),
flagged AS (
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CASE WHEN e.value < f.lo_fence OR e.value > f.hi_fence
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN f USING (event_type)
    GROUP BY e.event_type
)
SELECT flagged.event_type, flagged.n, flagged.n_outliers,
       round(flagged.n_outliers / flagged.n, 4) AS outlier_share,
       round(f.lo_fence, 4) AS lo_fence,
       round(f.hi_fence, 4) AS hi_fence
FROM flagged JOIN f USING (event_type)
"""


QUERIES = {
    "marc_field_extraction": (_marc_extraction, _marc_extraction_sql()),
    "item_json_roundtrip": (_item_json, _ITEM_JSON_SQL),
    "marc_size_guard": (_size_guard, _size_guard_sql()),
    "rollup_revenue": (_rollup, _ROLLUP_SQL),
    "running_total_window": (_running_total, _RUNNING_SQL),
    "cube_lineitem_status": (_cube, _CUBE_SQL),
    "group_percentiles": (_percentiles, _PERCENTILES_SQL),
    "iqr_outlier_filter": (_iqr_outliers, _IQR_SQL),
}
