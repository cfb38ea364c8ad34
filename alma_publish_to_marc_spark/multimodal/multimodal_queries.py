"""Multimodal queries — ALL fully oracle-checked. The decode/frame
stages run through mapInPandas / binary slicing on the Spark side; their
oracles are expressible because (a) the fake decoder derives dimensions
from md5 of the payload, and DuckDB's md5(VARCHAR) hashes the same UTF-8
bytes, and (b) the driver corpus is pure ASCII at every sf (verified
octet_length == length), so DuckDB's character slicing equals Spark's
byte slicing. Value-level assertions also live in
tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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

QUERIES = {
    "multimodal_metadata": (_metadata, _METADATA_SQL),
    "media_decode_stub": (_decode, _DECODE_SQL),
    "media_frame_sample": (_frames, _FRAMES_SQL),
}
