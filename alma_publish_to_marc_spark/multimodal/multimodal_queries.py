"""Multimodal queries — ALL fully oracle-checked. The decode/frame
stages run through mapInPandas / binary slicing on the Spark side; their
oracles are expressible because (a) the fake decoder derives dimensions
from md5 of the payload, and DuckDB's md5(VARCHAR) hashes the same UTF-8
bytes, and (b) the driver corpus is pure ASCII at every sf (verified
octet_length == length), so DuckDB's character slicing equals Spark's
byte slicing. Value-level assertions also live in
tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import columns as M


def _metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = M.attach_binary_payload(docs, "doc_id", "text")
    return payloads.select(
        "doc_id", "media_format", "n_bytes",
        F.md5("payload").alias("checksum"),
    )


_FORMATS_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END"
)

_METADATA_SQL = f"""
SELECT doc_id,
       {_FORMATS_CASE} AS media_format,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


def _decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # pin the deterministic fake: the oracle's values must not depend on
    # which codecs happen to be installed (pick_decoder is the
    # production default)
    return M.decode_media(M.attach_binary_payload(docs, "doc_id", "text"),
                          decoder=M._decode_image_fake)


def _frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    frames = M.frame_sample(M.attach_binary_payload(docs, "doc_id", "text"))
    # project frame bytes to a hash so the result is comparable/stable
    return frames.select("doc_id", "frame_no",
                         F.md5("frame_bytes").alias("frame_checksum"))


# Mirrors columns._decode_image_fake: dims from md5-hex nibbles.
_DECODE_SQL = f"""
SELECT doc_id,
       {_FORMATS_CASE} AS media_format,
       CAST(16 + CAST('0x' || substr(md5(text), 1, 4) AS INT) % 2048 AS INT)
           AS width,
       CAST(16 + CAST('0x' || substr(md5(text), 5, 4) AS INT) % 2048 AS INT)
           AS height,
       CAST(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS INT) AS n_channels,
       md5(text) AS checksum
FROM documents
"""

# Mirrors columns.frame_sample: 4 evenly-spaced 256-byte windows.
_FRAMES_SQL = """
SELECT doc_id,
       CAST(i AS INT) AS frame_no,
       md5(substr(text, CAST(i * greatest(length(text) // 4, 1) + 1 AS BIGINT),
                  256)) AS frame_checksum
FROM documents, unnest(generate_series(0, 3)) AS t(i)
"""

def _byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return M.byte_histogram_features(
        M.attach_binary_payload(docs, "doc_id", "text"))


# ASCII corpus (octet_length == length) → DuckDB can mirror the byte
# math on characters: bucket = ascii(ch) // 16. Dominant bucket ties
# break to the LOWEST bucket via struct-min on (-count, bucket) —
# numpy argmax returns the first maximum, same rule.
_BYTE_FEATURES_SQL = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
bc AS (
    SELECT doc_id, ascii(ch) // 16 AS bucket, count(*) AS c
    FROM chars GROUP BY 1, 2
),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total FROM bc
        GROUP BY doc_id),
ent AS (
    SELECT bc.doc_id,
           round(-sum((c / total) * log2(c / total)), 4) AS byte_entropy,
           min(struct_pack(negc := -c, b := bucket)) AS dom
    FROM bc JOIN tot USING (doc_id)
    GROUP BY bc.doc_id
)
SELECT ent.doc_id,
       CAST(tot.total AS INT) AS n_bytes,
       ent.byte_entropy,
       CAST((ent.dom).b AS INT) AS dominant_bucket,
       round(-(ent.dom).negc / tot.total, 4) AS dominant_share
FROM ent JOIN tot USING (doc_id)
"""


SHARD_BYTES = 16384   # target shard size (WebDataset-style tar budget)
SHARD_BLOCK = 100     # ids per prefix-scan block


def _shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack media payloads into byte-budgeted shards in id order — the
    WebDataset layout step: a loader streams shard k as one sequential
    read, and an item's shard is a pure function of the corpus, so the
    layout is reproducible.

    Shard id = floor(global_byte_offset / SHARD_BYTES) (offset-based
    packing: an item straddling a boundary belongs to the shard where
    it starts). The global running offset is computed as a DISTRIBUTED
    two-level prefix scan, never a single global window: per-block
    totals (one small aggregation over doc_id div SHARD_BLOCK blocks)
    get block-prefix offsets via a window over the tiny block table,
    then each block computes its within-block running sum in parallel
    (window partitioned BY block). The only single-partition window
    touches #blocks rows — corpus_size / SHARD_BLOCK — not documents;
    all sums are exact integers, so the layout is bit-deterministic.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sized = (M.attach_binary_payload(docs, "doc_id", "text")
             .select("doc_id", "n_bytes",
                     (F.col("doc_id") - F.pmod("doc_id", F.lit(SHARD_BLOCK)))
                     .alias("block")))
    totals = sized.groupBy("block").agg(F.sum("n_bytes").alias("block_bytes"))
    wb = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "block", F.coalesce(F.sum("block_bytes").over(wb), F.lit(0))
        .alias("block_offset"))
    ww = Window.partitionBy("block").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    placed = (sized.join(F.broadcast(offsets), "block")
              .select("doc_id", "n_bytes",
                      (F.col("block_offset")
                       + F.coalesce(F.sum("n_bytes").over(ww), F.lit(0)))
                      .alias("byte_offset")))
    return placed.select(
        "doc_id", "n_bytes", "byte_offset",
        F.floor(F.col("byte_offset") / SHARD_BYTES).cast("int")
         .alias("shard_id"),
        F.pmod("byte_offset", F.lit(SHARD_BYTES)).cast("long")
         .alias("shard_offset"))


_SHARD_SQL = f"""
WITH sized AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           doc_id - (doc_id % {SHARD_BLOCK}) AS block
    FROM documents
),
totals AS (
    SELECT block, sum(n_bytes) AS block_bytes FROM sized GROUP BY block
),
offsets AS (
    SELECT block,
           coalesce(sum(block_bytes) OVER (
               ORDER BY block
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS block_offset
    FROM totals
),
placed AS (
    SELECT s.doc_id, s.n_bytes,
           o.block_offset + coalesce(sum(s.n_bytes) OVER (
               PARTITION BY s.block ORDER BY s.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS byte_offset
    FROM sized s JOIN offsets o USING (block)
)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(byte_offset AS BIGINT) AS byte_offset,
       CAST(floor(byte_offset / {SHARD_BYTES}) AS INT) AS shard_id,
       CAST(byte_offset % {SHARD_BYTES} AS BIGINT) AS shard_offset
FROM placed
"""


QUERIES = {
    "multimodal_metadata": (_metadata, _METADATA_SQL),
    "media_decode_stub": (_decode, _DECODE_SQL),
    "media_frame_sample": (_frames, _FRAMES_SQL),
    "media_shard_assignment": (_shard_assignment, _SHARD_SQL),
    "media_byte_features": (_byte_features, _BYTE_FEATURES_SQL),
}
