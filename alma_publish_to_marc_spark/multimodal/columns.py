"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Decode picks its implementation at stage-build time (`pick_decoder`):
the REAL decoder (stdlib ``wave`` for audio, PIL for images) when this
environment can decode that family, else `_decode_image_fake`, a
deterministic byte-derived fake with the exact schema/batching the real
decoder uses — so the oracled queries pin the fake explicitly and stay
environment-independent, while real-codec environments decode for real
(unit-tested behind importorskip). `byte_histogram_features` needs no
codecs at all — it computes entropy triage on the raw bytes.
Everything Spark-side — schemas, partitioning, Arrow batch shapes,
explode of frame samples — is real and tested.

Scale notes: binary payloads ride in their own column so Parquet column
pruning keeps metadata-only queries from ever reading bytes; decode is a
narrow mapInPandas stage (no shuffle), so it scales linearly with input
splits. `frame_sample` explodes K rows per video — the only fan-out —
and is bounded by the sample count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_FORMATS = ("jpeg", "png", "wav")

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("checksum", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame_bytes", BinaryType()),
])


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in payload builder: encodes text bytes as the opaque binary
    column a real pipeline would get from `spark.read.format('binaryFile')`,
    plus the typed metadata columns (format tag, byte size)."""
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in MEDIA_FORMATS]),
        (F.col(id_col) % len(MEDIA_FORMATS) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        fmt.alias("media_format"),
    ).withColumn("n_bytes", F.length("payload"))


def available_codecs() -> dict[str, bool]:
    """Capability probe, run at stage-build time on the driver: which
    media families can be decoded for real in this environment. Audio
    is always true (stdlib ``wave``); images need PIL."""
    try:
        import PIL.Image  # noqa: F401
        image = True
    except ImportError:
        image = False
    return {"image": image, "audio": True}


def _decode_image_real(payload: bytes, media_format: str):
    """Real decoder: stdlib ``wave`` for audio (width = frames,
    height = sample rate), PIL for images (raises ImportError where PIL
    is absent — callers choose via :func:`pick_decoder`, which probes
    first). Same 4-tuple contract as the deterministic fake."""
    import io

    digest = hashlib.md5(payload).hexdigest()
    if media_format == "wav":
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            return (w.getnframes(), w.getframerate(), w.getnchannels(),
                    digest)
    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.size[0], img.size[1], len(img.getbands()), digest


def pick_decoder(strict: bool = False):
    """Stage-build-time selection: the real decoder when this
    environment can decode (images need PIL), else the deterministic
    fake. With ``strict=False`` (the default) the real decoder is also
    wrapped per payload: a corrupt blob falls back to the fake instead
    of failing the job — at 100 TB a handful of truncated files must
    never kill the stage, and the fake's digest-derived row is still
    deterministic and join-safe."""
    caps = available_codecs()

    def per_format(payload: bytes, media_format: str):
        # route per FAMILY: wav decodes for real wherever stdlib wave
        # exists even if PIL is absent (the probe reports audio and
        # image independently — honor both, not just image)
        family = "audio" if media_format == "wav" else "image"
        if not caps[family]:
            return _decode_image_fake(payload, media_format)
        return _decode_image_real(payload, media_format)

    if strict:
        return per_format

    def tolerant(payload: bytes, media_format: str):
        try:
            return per_format(payload, media_format)
        except Exception:
            return _decode_image_fake(payload, media_format)
    return tolerant


def _decode_image_fake(payload: bytes, media_format: str) -> tuple[int, int, int, str]:
    """Deterministic fake: dimensions derived from the payload digest —
    stable across runs/engines, exercises the full Arrow path."""
    digest = hashlib.md5(payload).hexdigest()
    width = 16 + int(digest[:4], 16) % 2048
    height = 16 + int(digest[4:8], 16) % 2048
    channels = 1 if media_format == "wav" else 3
    return width, height, channels, digest


def decode_media(df: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas decode stage: (doc_id, payload, media_format) →
    DECODED_SCHEMA. One Arrow batch in, one out; no shuffle.

    ``decoder`` defaults to :func:`pick_decoder`'s probe result (real
    codecs when present, deterministic fake otherwise); the oracled
    queries pin ``_decode_image_fake`` explicitly so their values are
    environment-independent."""
    decoder = decoder or pick_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decoder(p, f)
                for p, f in zip(pdf["payload"], pdf["media_format"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "media_format": pdf["media_format"].values,
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_channels": [d[2] for d in decoded],
                "checksum": [d[3] for d in decoded],
            })

    return df.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4,
                 frame_bytes: int = 256) -> DataFrame:
    """Deterministic frame sampling: K evenly-spaced byte windows per
    payload (a real sampler would seek keyframes). Column-expression
    explode — the payload is sliced JVM-side, no Python round-trip."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    out = df.select(
        "doc_id",
        F.explode(idx).alias("frame_no"),
        F.col("payload"),
        F.col("n_bytes"),
    ).withColumn(
        "offset",
        (F.col("frame_no") * F.greatest(
            (F.col("n_bytes") / n_frames).cast("int"), F.lit(1)) + 1),
    ).withColumn(
        "frame_bytes",
        F.expr(f"substring(payload, offset, {frame_bytes})").cast("binary"),
    )
    return out.select("doc_id", F.col("frame_no").cast("int").alias("frame_no"),
                      "frame_bytes")


FEATURES_SCHEMA = ("doc_id long, n_bytes int, byte_entropy double, "
                   "dominant_bucket int, dominant_share double")


def byte_histogram_features(df: DataFrame) -> DataFrame:
    """REAL feature extraction over media payloads (no codecs needed —
    this computes on the raw bytes a decoder would consume): 16-bucket
    byte histogram → Shannon entropy, dominant bucket (ties to the
    lowest bucket id) and its share. Entropy separates compressed/
    encrypted media (high) from text-like or padded payloads (low) —
    the cheap triage a multimodal ingest runs before spending decode
    compute.

    Arrow-batched mapInPandas, one batch in → one out, no shuffle; the
    entropy sum runs in fixed ascending-bucket order so results are
    bit-stable. numpy does the counting (vectorized over the
    concatenated buffer per row)."""
    import math

    import numpy as np

    def r4(x: float) -> float:
        # half-UP at 4dp: Python/numpy round() is half-EVEN, DuckDB's
        # round() half-away — a share landing exactly on .xxxx5 (easy
        # with power-of-two byte totals) would differ in the last digit
        return math.floor(x * 10000 + 0.5) / 10000

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"].values, "n_bytes": [],
                   "byte_entropy": [], "dominant_bucket": [],
                   "dominant_share": []}
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=16)
                total = int(counts.sum())
                if total == 0:
                    # zero-length payload: emit a row, never NaN-crash
                    # the whole Arrow batch (triage must be robust)
                    out["n_bytes"].append(0)
                    out["byte_entropy"].append(0.0)
                    out["dominant_bucket"].append(0)
                    out["dominant_share"].append(0.0)
                    continue
                ent = 0.0
                for c in counts:  # fixed bucket order: deterministic sum
                    if c:
                        p = c / total
                        ent -= p * np.log2(p)
                dom = int(counts.argmax())  # first max = lowest bucket
                out["n_bytes"].append(total)
                out["byte_entropy"].append(r4(float(ent)))
                out["dominant_bucket"].append(dom)
                out["dominant_share"].append(r4(counts[dom] / total))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURES_SCHEMA)
