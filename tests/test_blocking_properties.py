"""Blocking-scheme completeness properties: the blocked join must find
EXACTLY the pairs a brute-force pass finds, and content-defined chunks
must reassemble losslessly."""

import pytest
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.operators import relational_queries as RQ

SF = "/root/testdata/sf0.001"


def test_geo_blocking_finds_exactly_the_brute_force_pairs(spark):
    blocked = {(r.pid_a, r.pid_b)
               for r in RQ._geo_neighbor_join(spark, SF).collect()}
    pts = RQ._geo_points(spark, SF).collect()
    eps2 = RQ.GEO_EPS_MICRO * RQ.GEO_EPS_MICRO
    brute = set()
    for i, a in enumerate(pts):
        for b in pts[i + 1:]:
            lo, hi = sorted((a.pid, b.pid))
            d2 = (a.lat_u - b.lat_u) ** 2 + (a.lon_u - b.lon_u) ** 2
            if d2 <= eps2:
                brute.add((lo, hi))
    assert blocked == brute, (
        f"missing={brute - blocked} extra={blocked - brute}")


def test_cdc_chunks_reassemble_to_original_text(spark):
    # rebuild the chunk bounds exactly as cdc_chunk_dedup does and
    # assert concatenated chunks == text for every doc
    from alma_publish_to_marc_spark.operators.dedup_queries import CDC_MASK
    from alma_publish_to_marc_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    poly = ("cast(conv(substr(md5(substring(text, i - 7, 8)), 1, 4),"
            " 16, 10) as bigint)")
    rebuilt = docs.select(
        "doc_id", "text",
        F.expr(f"""
          array_join(
            filter(
              zip_with(
                transform(concat(array(0),
                          filter(sequence(8, length(text)),
                                 i -> {poly} % {CDC_MASK} = 0)),
                          x -> x + 1),
                concat(filter(sequence(8, length(text)),
                              i -> {poly} % {CDC_MASK} = 0),
                       array(length(text))),
                (s, e) -> CASE WHEN e >= s
                               THEN substring(text, s, e - s + 1)
                               ELSE NULL END),
              p -> p IS NOT NULL), '')
        """).alias("reassembled"))
    bad = rebuilt.where(F.col("reassembled") != F.col("text")).count()
    assert bad == 0


def test_hashed_content_neardup_finds_all_planted_copies(spark):
    from alma_publish_to_marc_spark.functions import hash_embedding as HE
    from alma_publish_to_marc_spark.tables import load
    from pyspark.sql import functions as F

    pairs = HE.content_neardup_hashed(spark, SF).collect()
    docs = load(spark, SF, "documents")
    off = docs.agg(F.max("doc_id") + 1).collect()[0][0]
    planted = {(r.doc_id, r.doc_id + off)
               for r in docs.where("doc_id % 10 = 0")
                            .select("doc_id").collect()}
    found = {(r.id_a, r.id_b) for r in pairs}
    missing = planted - found
    assert not missing, f"planted copies not recalled: {missing}"
    by_pair = {(r.id_a, r.id_b): r.cosine for r in pairs}
    for p in planted:
        assert by_pair[p] == 1.0
