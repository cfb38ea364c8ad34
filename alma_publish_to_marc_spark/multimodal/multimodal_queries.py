"""Multimodal queries. `multimodal_metadata` is fully oracle-checked
(byte metadata is SQL-expressible); the decode/frame stages go through
mapInPandas (not SQL-expressible) → rows-only checks, with value-level
assertions living in tests/test_multimodal.py."""

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
    return M.decode_media(M.attach_binary_payload(docs, "doc_id", "text"))


def _frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    frames = M.frame_sample(M.attach_binary_payload(docs, "doc_id", "text"))
    # project frame bytes to a hash so the result is comparable/stable
    return frames.select("doc_id", "frame_no",
                         F.md5("frame_bytes").alias("frame_checksum"))


QUERIES = {
    "multimodal_metadata": (_metadata, _METADATA_SQL),
    "media_decode_stub": (_decode, None),   # mapInPandas → rows-only check
    "media_frame_sample": (_frames, None),  # binary slicing → rows-only check
}
