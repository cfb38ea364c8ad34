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


# ---------------------------------------------------------------------------
# Cross-modal retrieval: text-token queries vs byte-n-gram media vectors
# ---------------------------------------------------------------------------
_XM_GRAM = 4
_XM_QMOD = 97  # query panel: doc_id % 97 == 0


def _cross_modal_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-shaped retrieval PLUMBING with no model: media payloads
    (opaque binary) and text queries embed through the SAME 64-dim
    byte-4-gram hashed-TF encoder (the shared-space property a real
    dual encoder learns); each query is the FIRST HALF of a document's
    text (a caption-like excerpt) retrieving its top-1 media item by
    cosine. Self-retrieval (excerpt → own full payload) is the recall
    fixture — high but not trivially 1.0, since the query sees only
    half the grams.

    The byte encoder is modality-agnostic: it reads bytes, not words —
    swap the stand-in payloads for real image/audio blobs and the
    pipeline shape (binary column → per-item vector → broadcast query
    panel → argmax join) is unchanged; only the featurizer upgrades to
    a real encoder behind mapInPandas (see columns.pick_decoder).

    Scale: media vectors are one explode + 64 conditional sums per
    item (map-side combinable); the query panel (~1% of docs)
    broadcasts; argmax is struct-max per query — no global shuffle of
    the media corpus beyond its vector aggregate. Cosines are
    left-fold doubles on identical inputs in both engines; ranking
    ties break on media id via struct-max."""
    from ..functions.hash_embedding import HDIM

    def gram_vectors(frame, id_name, text_col, out_name):
        """Shared byte-4-gram hashed-TF encoder (both modalities)."""
        grams = frame.select(
            id_name,
            F.explode(F.transform(
                F.sequence(F.lit(1),
                           F.greatest(F.length(text_col) - (_XM_GRAM - 1),
                                      F.lit(0))),
                lambda i: text_col.substr(i, F.lit(_XM_GRAM)))).alias("g"))
        dim = F.pmod(F.conv(F.substring(F.md5("g"), 1, 12), 16, 10)
                     .cast("long"), F.lit(HDIM))
        counts = (grams.select(id_name, dim.alias("d"))
                  .groupBy(id_name)
                  .agg(*[F.sum(F.when(F.col("d") == i, 1).otherwise(0))
                         .cast("double").alias(f"c{i}")
                         for i in range(HDIM)]))
        raw = F.array(*[F.col(f"c{i}") for i in range(HDIM)])
        return (counts
                .select(id_name, raw.alias("r"),
                        F.sqrt(F.aggregate(
                            F.transform(raw, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x)).alias("nm"))
                .select(id_name,
                        F.when(F.col("nm") == 0,
                               F.transform("r", lambda x: x * 0.0))
                         .otherwise(F.transform(
                             "r",
                             lambda x: F.round(x / F.col("nm"), 6) + 0.0))
                         .alias(out_name)))

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = M.attach_binary_payload(docs, "doc_id", "text")
    decoded = media.select(F.col("doc_id").alias("media_id"),
                           F.decode("payload", "UTF-8").alias("btxt"))
    mvec = gram_vectors(decoded, "media_id", F.col("btxt"), "mv")
    qdocs = (docs.where(F.col("doc_id") % _XM_QMOD == 0)
             .select(F.col("doc_id").alias("qid"),
                     F.col("text").substr(
                         F.lit(1), (F.length("text") / 2).cast("int"))
                      .alias("qtext")))
    qvec = gram_vectors(qdocs, "qid", F.col("qtext"), "qv")
    dotc = F.round(F.aggregate(
        F.zip_with(F.col("qv"), F.col("mv"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x), 6)
    scored = (mvec.join(F.broadcast(qvec))
              .select("qid", "media_id", dotc.alias("cos")))
    best = (scored.groupBy("qid")
            .agg(F.max(F.struct(F.col("cos"), F.col("media_id"))).alias("m"))
            .select("qid", F.col("m.media_id").alias("top_media"),
                    F.col("m.cos").alias("cos")))
    return best.select(
        "qid", "top_media", "cos",
        (F.col("qid") == F.col("top_media")).cast("int").alias("self_hit"))


def _cross_modal_sql() -> str:
    from ..functions.hash_embedding import HDIM

    sums = ", ".join(
        f"CAST(sum(CASE WHEN d = {i} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS c{i}" for i in range(HDIM))
    arr = "[" + ", ".join(f"c{i}" for i in range(HDIM)) + "]"
    qmod, gram, gram_m1, hdim = _XM_QMOD, _XM_GRAM, _XM_GRAM - 1, HDIM
    return rf"""
WITH qdocs AS (
    SELECT doc_id AS qid, substr(text, 1, len(text) // 2) AS qtext
    FROM documents WHERE doc_id % {qmod} = 0
), qgrams AS (
    SELECT qid, unnest(list_transform(
               range(1, greatest(len(qtext) - {gram_m1}, 0) + 1),
               i -> substr(qtext, i, {gram}))) AS g
    FROM qdocs
), qh AS (
    SELECT qid, {sums}
    FROM (SELECT qid,
                 CAST('0x' || substr(md5(g), 1, 12) AS BIGINT) % {hdim} AS d
          FROM qgrams)
    GROUP BY qid
), qvec AS (
    SELECT qid,
           CASE WHEN nm = 0 THEN list_transform(r, x -> x * 0.0)
                ELSE list_transform(r, x -> round(x / nm, 6) + 0.0)
           END AS qv
    FROM (SELECT qid, {arr} AS r,
                 sqrt(list_reduce(list_prepend(0.0,
                     list_transform({arr}, x -> x * x)),
                     (a, x) -> a + x)) AS nm
          FROM qh)
),
mgrams AS (
    SELECT doc_id AS media_id,
           unnest(list_transform(
               range(1, greatest(len(text) - {gram_m1}, 0) + 1),
               i -> substr(text, i, {gram}))) AS g
    FROM documents
), mh AS (
    SELECT media_id, {sums}
    FROM (SELECT media_id,
                 CAST('0x' || substr(md5(g), 1, 12) AS BIGINT) % {hdim} AS d
          FROM mgrams)
    GROUP BY media_id
), mvec AS (
    SELECT media_id,
           CASE WHEN nm = 0 THEN list_transform(r, x -> x * 0.0)
                ELSE list_transform(r, x -> round(x / nm, 6) + 0.0)
           END AS mv
    FROM (SELECT media_id, {arr} AS r,
                 sqrt(list_reduce(list_prepend(0.0,
                     list_transform({arr}, x -> x * x)),
                     (a, x) -> a + x)) AS nm
          FROM mh)
), scored AS (
    SELECT q.qid AS qid, m.media_id,
           round(list_reduce(list_prepend(0.0,
               list_transform(range(1, {hdim} + 1),
                              i -> q.qv[i] * m.mv[i])),
               (a, x) -> a + x), 6) AS cos
    FROM qvec q CROSS JOIN mvec m
), best AS (
    SELECT qid, max(struct_pack(cos := cos, media_id := media_id)) AS s
    FROM scored GROUP BY qid
)
SELECT qid, s.media_id AS top_media, s.cos AS cos,
       CAST(CASE WHEN qid = s.media_id THEN 1 ELSE 0 END AS INT) AS self_hit
FROM best
"""


QUERIES["cross_modal_retrieval"] = (_cross_modal_retrieval, _cross_modal_sql())


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup detection over media payload bytes
# ---------------------------------------------------------------------------
# 60 bits, not 64: DuckDB raises on 1 << 63 (signed sign bit) where
# Spark would silently wrap -- stay below bit 62 in BOTH engines.
PHASH_BITS = 60
PHASH_WIN_BYTES = 16
PHASH_BAND_BITS = 15
PHASH_BANDS = PHASH_BITS // PHASH_BAND_BITS
PHASH_MAX_HAMMING = 4


def _media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection on the raw MEDIA PAYLOAD (no decode):
    an aHash-style 60-bit perceptual signature — fixed 16-byte windows
    anchored at the payload START (overflow folds into the last
    window), bit w set when window w's mean byte value is at or above
    the payload mean. Absolute windows, not proportional ones: a
    re-encode that appends/strips a metadata tail must only disturb
    the trailing bits — proportional windows would shift every
    boundary and scatter the whole signature (measured: proportional
    windowing put planted tail variants at Hamming 17–43; absolute
    windowing keeps them within the band budget: measured 0–4,
    mean 1.04, so the ≤4 budget captures every planted variant — the
    invariant test pins that recall; the synthetic 31-word vocabulary
    also compresses byte-energy profiles enough that ~8k background
    pairs share the budget, the same corpus artifact simhash_pairs
    documents — real media bytes spread far wider) — banded into 4×15-bit blocks for candidate
    generation and verified by exact XOR popcount (Hamming ≤ 4). This
    is the image-dedup pass a multimodal pipeline runs BEFORE paying
    for decode: re-encoded/metadata-tweaked copies keep near-identical
    byte-energy profiles, and the signature needs only one scan of the
    bytes. (Text stands in for payload bytes here exactly as in
    ``media_byte_features`` — ASCII corpus, so DuckDB mirrors the byte
    math on characters.)

    Determinism: window means compare via integer cross-multiplication
    (s_w·n ≥ s·n_w) — no division anywhere; the signature is an exact
    bit sum; banding and popcount are integer ops. The windowing floor
    (p·64 div L) is nonnegative, so div == //.

    Scale: the simhash recipe byte-for-byte (`operators/dedup.py::
    simhash_pairs`): signatures are one map-side-combinable
    aggregation per payload; the band self-join buckets on (band_id,
    16-bit value) so candidate volume stays bucket-local; verification
    is a scan-side bit_count. Payload bytes shuffle ONCE (the window
    aggregation); pairs never carry payloads.
    """
    from ..operators.dedup_queries import _near_dup_corpus

    docs = _near_dup_corpus(spark, sf_dir)
    chars = (docs
             .select("doc_id", F.length("text").alias("L"),
                     F.posexplode(F.split("text", "")).alias("p", "ch"))
             .where(F.col("ch") != ""))
    wc = (chars
          .select("doc_id",
                  F.least(F.expr(f"p div {PHASH_WIN_BYTES}"),
                          F.lit(PHASH_BITS - 1)).alias("w"),
                  F.ascii("ch").cast("long").alias("a"))
          .groupBy("doc_id", "w")
          .agg(F.sum("a").alias("s_w"), F.count(F.lit(1)).alias("n_w")))
    tot = wc.groupBy("doc_id").agg(F.sum("s_w").alias("s"),
                                   F.sum("n_w").alias("n"))
    bits = (wc.join(tot, "doc_id")
            .groupBy("doc_id")
            .agg(F.sum(
                F.when(F.col("s_w") * F.col("n") >= F.col("s") * F.col("n_w"),
                       F.expr("shiftleft(cast(1 as bigint), cast(w as int))"))
                 .otherwise(F.lit(0).cast("long"))).alias("sig")))
    # collapse identical signatures BEFORE the band join: exact-copy
    # mass (re-uploads, mirrored shards — the dominant duplicate class
    # in real media corpora, and exactly what the 1×→10× replication
    # probe simulates) then costs nothing in the join, which runs on
    # DISTINCT signatures only; the quadratic intra-group pair set is
    # pure output materialization (one explode, no shuffle). Probe:
    # 4× replication went 59.5 s → ~7 s after the collapse.
    groups = (bits.groupBy("sig")
              .agg(F.sort_array(F.collect_list("doc_id")).alias("ids")))
    intra = (groups
             .select("sig", F.explode("ids").alias("id_a"),
                     F.col("ids").alias("_ids"))
             .select("id_a", F.explode("_ids").alias("id_b"))
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", F.lit(0).alias("hamming")))
    bands = groups.select(
        "sig", "ids",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("sig"), b * PHASH_BAND_BITS)
                 .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                 .alias("band_val"))
            for b in range(PHASH_BANDS)])).alias("bb")) \
        .select("sig", "ids", F.col("bb.band_id").alias("band_id"),
                F.col("bb.band_val").alias("band_val"))
    a = bands.select(F.col("sig").alias("sig_a"),
                     F.col("ids").alias("ids_a"), "band_id", "band_val")
    b = bands.select(F.col("sig").alias("sig_b"),
                     F.col("ids").alias("ids_b"), "band_id", "band_val")
    ham = F.bit_count(F.expr("sig_a ^ sig_b"))
    cross = (a.join(b, ["band_id", "band_val"])
             .where(F.col("sig_a") < F.col("sig_b"))
             .select("sig_a", "sig_b", "ids_a", "ids_b").distinct()
             .withColumn("hamming", ham.cast("int"))
             .where(F.col("hamming") <= PHASH_MAX_HAMMING)
             .select(F.explode("ids_a").alias("_a"), "ids_b", "hamming")
             .select(F.col("_a"), F.explode("ids_b").alias("_b"), "hamming")
             .select(F.least("_a", "_b").alias("id_a"),
                     F.greatest("_a", "_b").alias("id_b"), "hamming"))
    return intra.unionByName(cross).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _phash_sql() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band_id, "
        f"(sig >> {b * PHASH_BAND_BITS}) & {(1 << PHASH_BAND_BITS) - 1} "
        f"AS band_val FROM bits"
        for b in range(PHASH_BANDS))
    from ..operators.dedup_queries import SQL_NEAR_CORPUS

    return f"""
WITH {SQL_NEAR_CORPUS},
chars AS (
    SELECT doc_id, length(text) AS L,
           unnest(list_transform(range(1, length(text) + 1),
                  i -> struct_pack(p := i - 1, ch := text[i]))) AS s
    FROM corpus
),
wc AS (
    SELECT doc_id, least(s.p // {PHASH_WIN_BYTES}, {PHASH_BITS - 1}) AS w,
           CAST(sum(ascii(s.ch)) AS BIGINT) AS s_w,
           CAST(count(*) AS BIGINT) AS n_w
    FROM chars GROUP BY doc_id, least(s.p // {PHASH_WIN_BYTES}, {PHASH_BITS - 1})
),
tot AS (SELECT doc_id, CAST(sum(s_w) AS BIGINT) AS s,
               CAST(sum(n_w) AS BIGINT) AS n
        FROM wc GROUP BY doc_id),
bits AS (
    SELECT wc.doc_id,
           CAST(sum(CASE WHEN s_w * n >= s * n_w
                         THEN (CAST(1 AS BIGINT) << w)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
    FROM wc JOIN tot USING (doc_id)
    GROUP BY wc.doc_id
),
bands AS ({band_selects}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {PHASH_MAX_HAMMING}
"""


QUERIES["media_phash_neardup"] = (_media_phash_neardup, _phash_sql())


# --------------------------------------------------------------------------
# media_energy_segments: VAD-style frame-energy segmentation of payloads
# --------------------------------------------------------------------------

_VAD_FRAME = 32  # payload bytes per analysis frame


def _media_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation of each media payload: chop
    the byte stream into fixed 32-byte frames, score each frame's
    energy Σ byte², mark frames at-or-above the payload's mean frame
    energy as ACTIVE (the adaptive threshold of a simple VAD), and
    merge consecutive active frames into segments via the
    gaps-and-islands window — the exact plumbing (frame → threshold →
    island-merge) a real audio pipeline runs after PCM decode, over
    the same deterministic fake payloads as `media_byte_features`
    (ASCII corpus, so byte == character and DuckDB mirrors the math).

    Determinism: frame energies are exact int64 (Σ ascii² ≤ 32·127²);
    the threshold compare is the integer cross-multiplication
    ``energy·n_frames ≥ total_energy`` — no division, no floats
    anywhere. Island ids come from the frame-index minus a keyed
    row_number, both integer windows ordered by frame index.

    Scale: one explode to payload_len/32 frame rows (linear in corpus
    bytes, the decode-shaped fan-out), two doc-keyed windows, one
    doc-keyed aggregate; nothing crosses documents.
    """
    docs = (load(spark, sf_dir, "documents")
            .filter(F.length("text") > 0)
            .select("doc_id", "text",
                    ((F.length("text") + _VAD_FRAME - 1)
                     / _VAD_FRAME).cast("long").alias("n_frames")))
    frames = docs.select(
        "doc_id", "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("fi"),
        "text")
    energy = frames.select(
        "doc_id", "n_frames", "fi",
        F.expr(f"aggregate(transform(sequence(1, length(substr(text, "
               f"fi * {_VAD_FRAME} + 1, {_VAD_FRAME}))), "
               f"i -> ascii(substr(substr(text, fi * {_VAD_FRAME} + 1, "
               f"{_VAD_FRAME}), i, 1))), cast(0 as bigint), "
               f"(a, b) -> a + b * b)").alias("e"))
    tot = (energy.groupBy("doc_id")
           .agg(F.sum("e").alias("tot_e")))
    flagged = (energy.join(tot, "doc_id")
               .select("doc_id", "n_frames", "fi", "e",
                       (F.col("e") * F.col("n_frames") >= F.col("tot_e"))
                       .alias("active")))
    w = Window.partitionBy("doc_id").orderBy("fi")
    grp = (flagged.filter("active")
           .withColumn("grp", F.col("fi") - F.row_number().over(w)))
    segs = (grp.groupBy("doc_id", "grp")
            .agg(F.count(F.lit(1)).alias("seg_len")))
    per_doc = (segs.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_segments"),
                    F.max("seg_len").alias("longest_seg"),
                    F.sum("seg_len").alias("n_active")))
    return (docs.select("doc_id", "n_frames")
            .join(tot, "doc_id")
            .join(per_doc, "doc_id", "left")
            .select("doc_id", "n_frames", F.col("tot_e").alias("total_energy"),
                    F.coalesce("n_active", F.lit(0)).alias("n_active"),
                    F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
                    F.coalesce("longest_seg", F.lit(0)).alias("longest_seg")))


_VAD_SQL = f"""
WITH docs AS (
  SELECT doc_id, text,
         CAST((length(text) + {_VAD_FRAME} - 1) // {_VAD_FRAME} AS BIGINT)
             AS n_frames
  FROM documents WHERE length(text) > 0
), frames AS (
  SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS fi, text
  FROM docs
), energy AS (
  SELECT doc_id, n_frames, fi,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(
             range(1, length(substr(text, CAST(fi * {_VAD_FRAME} + 1
                                               AS BIGINT),
                                    {_VAD_FRAME})) + 1),
             i -> CAST(ascii(substr(substr(text,
                    CAST(fi * {_VAD_FRAME} + 1 AS BIGINT), {_VAD_FRAME}),
                    CAST(i AS BIGINT), 1)) AS BIGINT))),
           (a, b) -> a + b * b) AS e
  FROM frames
), tot AS (
  SELECT doc_id, CAST(sum(e) AS BIGINT) AS tot_e FROM energy GROUP BY 1
), flagged AS (
  SELECT e.doc_id, e.n_frames, e.fi, e.e,
         e.e * e.n_frames >= t.tot_e AS active
  FROM energy e JOIN tot t ON e.doc_id = t.doc_id
), grp AS (
  SELECT doc_id, fi,
         fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp
  FROM flagged WHERE active
), segs AS (
  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS seg_len
  FROM grp GROUP BY doc_id, grp
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(max(seg_len) AS BIGINT) AS longest_seg,
         CAST(sum(seg_len) AS BIGINT) AS n_active
  FROM segs GROUP BY doc_id
)
SELECT d.doc_id, d.n_frames, t.tot_e AS total_energy,
       coalesce(p.n_active, 0) AS n_active,
       coalesce(p.n_segments, 0) AS n_segments,
       coalesce(p.longest_seg, 0) AS longest_seg
FROM docs d
JOIN tot t ON d.doc_id = t.doc_id
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""

QUERIES["media_energy_segments"] = (_media_energy_segments, _VAD_SQL)


# --------------------------------------------------------------------------
# media_patch_grid: ViT patchification plan over decoded dimensions
# --------------------------------------------------------------------------

_PATCH = 16          # ViT-B/16 patch side
_MAX_VIT_SEQ = 4096  # packing budget per sequence (CLS + patches)


def _media_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT preprocessing plan: for every decoded image, the 16x16
    patchification a vision transformer runs before embedding — grid
    shape after right/bottom padding to a patch multiple, total patch
    count, pad waste, and the resulting sequence length (CLS + patches)
    with a budget flag for images that exceed the packing window and
    need tiling. This is the planning pass a multimodal training
    pipeline runs BEFORE the expensive pixel work, to size shards and
    sequence-packing bins (cf. sequence_packing for text).

    The decode stage is the real mapInPandas Arrow path with the
    pinned deterministic fake decoder (module convention); everything
    downstream is exact integer ceil-division math, mirrored in the
    oracle from the same md5-derived dimensions.

    Scale: decode is embarrassingly parallel (no shuffle); the plan
    math is per-row column arithmetic — the whole query is one pass
    over the corpus with zero exchanges.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dec = M.decode_media(M.attach_binary_payload(docs, "doc_id", "text"),
                         decoder=M._decode_image_fake)
    g = dec.select(
        "doc_id", "media_format", "width", "height",
        F.expr(f"(cast(width as bigint) + {_PATCH - 1}) div {_PATCH}")
        .alias("grid_w"),
        F.expr(f"(cast(height as bigint) + {_PATCH - 1}) div {_PATCH}")
        .alias("grid_h"))
    return g.select(
        "doc_id", "media_format", "width", "height", "grid_w", "grid_h",
        (F.col("grid_w") * F.col("grid_h")).alias("n_patches"),
        (F.col("grid_w") * _PATCH - F.col("width")).alias("pad_x"),
        (F.col("grid_h") * _PATCH - F.col("height")).alias("pad_y"),
        (F.col("grid_w") * F.col("grid_h") + 1).alias("vit_seq_len"),
        (F.col("grid_w") * F.col("grid_h") + 1 > _MAX_VIT_SEQ)
        .alias("needs_tiling"))


_PATCH_GRID_SQL = f"""
WITH dec AS (
  SELECT doc_id, {_FORMATS_CASE} AS media_format,
         16 + CAST('0x' || substr(md5(text), 1, 4) AS INT) % 2048 AS width,
         16 + CAST('0x' || substr(md5(text), 5, 4) AS INT) % 2048 AS height
  FROM documents
),
g AS (
  SELECT doc_id, media_format, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height,
         CAST((width + {_PATCH - 1}) // {_PATCH} AS BIGINT) AS grid_w,
         CAST((height + {_PATCH - 1}) // {_PATCH} AS BIGINT) AS grid_h
  FROM dec
)
SELECT doc_id, media_format, width, height, grid_w, grid_h,
       grid_w * grid_h AS n_patches,
       grid_w * {_PATCH} - width AS pad_x,
       grid_h * {_PATCH} - height AS pad_y,
       grid_w * grid_h + 1 AS vit_seq_len,
       grid_w * grid_h + 1 > {_MAX_VIT_SEQ} AS needs_tiling
FROM g
"""

QUERIES["media_patch_grid"] = (_media_patch_grid, _PATCH_GRID_SQL)


# --------------------------------------------------------------------------
# audio_constellation_match: Shazam-style snippet-to-corpus fingerprinting
# --------------------------------------------------------------------------

_CM_DT_MAX = 6        # max anchor→target frame distance in a hash pair
_CM_EBUCKET = 1000    # energy quantization for hash robustness
_CM_SNIP_FIRST = 2    # snippet = frames [2, 9] of the query doc
_CM_SNIP_FRAMES = 8
_CM_TOPK = 3
# FIXED-size query panel: a fraction-of-corpus panel makes the match
# join O(N^2) as the corpus grows (the retrieval_ranking_metrics
# lesson; probe measured 3.5 -> 22.7 s at 1x -> 10x before the cap)
_CM_NQ = 32


def _cm_peaks_spark(frame_df):
    """(id, fi, e) → constellation peaks: frames that are a strict
    local max over their neighbors AND at-or-above the stream's mean
    energy (integer cross-multiplication, no division)."""
    w = Window.partitionBy("id").orderBy("fi")
    tot = Window.partitionBy("id")
    return (frame_df
            .withColumn("ep", F.lag("e", 1, -1).over(w))
            .withColumn("en", F.lead("e", 1, -1).over(w))
            .withColumn("tot_e", F.sum("e").over(tot))
            .withColumn("nf", F.count(F.lit(1)).over(tot))
            .where("e > ep AND e >= en AND e * nf >= tot_e")
            .select("id", "fi", F.expr(f"e div {_CM_EBUCKET}").alias("b")))


def _cm_hashes_spark(peaks):
    """Anchor→target pairs within the fan-out window, keyed by the
    16-byte md5 of (bucket_a, bucket_t, Δframes)."""
    a, t = peaks.alias("a"), peaks.alias("t")
    return (a.join(t, (F.col("a.id") == F.col("t.id"))
                   & (F.col("t.fi") > F.col("a.fi"))
                   & (F.col("t.fi") <= F.col("a.fi") + _CM_DT_MAX))
            .select(F.col("a.id").alias("id"),
                    F.col("a.fi").alias("afi"),
                    F.unhex(F.md5(F.concat_ws(
                        ":", F.col("a.b"), F.col("t.b"),
                        F.col("t.fi") - F.col("a.fi")))).alias("hk")))


def _audio_constellation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-fingerprint retrieval, the Shazam constellation shape
    (Wang 2003) over the deterministic fake byte streams: per-frame
    int64 energies → local-max peaks → anchor/target pair hashes →
    snippet-to-corpus hash join → OFFSET-CONSISTENT vote (matching
    hashes must agree on the time shift corpus_fi − snippet_fi; that
    coherence test is what separates true containment from chance
    hash collisions). Queries are frames [{f0}, {f1}) of every
    doc_id % 97 == 0 doc; top-{k} corpus matches per query. The
    invariant test asserts self-retrieval at rank 1.

    Determinism: energies and buckets exact int64; hash keys 16-byte
    md5; ranks tie-break on (score DESC, offset ASC via struct-min,
    doc_id ASC).

    Scale: corpus fingerprints are one linear pass (explode to
    frames → two doc-keyed windows → bounded ≤{dt}-frame fan-out);
    the snippet side is panel-sized and broadcasts into the hash
    join; the vote groups on (query, doc, offset) — cardinality
    bounded by matched hashes, never the corpus pairwise.
    """.format(f0=_CM_SNIP_FIRST, f1=_CM_SNIP_FIRST + _CM_SNIP_FRAMES,
               k=_CM_TOPK, dt=_CM_DT_MAX)
    docs = (load(spark, sf_dir, "documents")
            .filter(F.length("text") > 0).select("doc_id", "text"))

    def frame_energies(src, id_col, text_col):
        nf = ((F.length(text_col) + _VAD_FRAME - 1) / _VAD_FRAME) \
            .cast("long")
        frames = (src.select(F.col(id_col).alias("id"),
                             F.col(text_col).alias("tx"),
                             nf.alias("nf"))
                  .where(F.col("nf") >= 1)
                  .select("id", "tx", F.explode(
                      F.sequence(F.lit(0), F.col("nf") - 1)).alias("fi")))
        e = (f"aggregate(transform(sequence(1, length(substr(tx, "
             f"fi * {_VAD_FRAME} + 1, {_VAD_FRAME}))), "
             f"i -> ascii(substr(substr(tx, fi * {_VAD_FRAME} + 1, "
             f"{_VAD_FRAME}), i, 1))), cast(0 as bigint), "
             f"(a, b) -> a + b * b)")
        return frames.select("id", "fi", F.expr(e).alias("e"))

    corpus_h = _cm_hashes_spark(_cm_peaks_spark(
        frame_energies(docs, "doc_id", "text")))
    snips = (docs.where(F.col("doc_id") % 97 == 0)
             .orderBy("doc_id").limit(_CM_NQ)
             .select("doc_id", F.substring(
                 "text", _CM_SNIP_FIRST * _VAD_FRAME + 1,
                 _CM_SNIP_FRAMES * _VAD_FRAME).alias("snip"))
             .where(F.length("snip") > 0))
    snip_h = (_cm_hashes_spark(_cm_peaks_spark(
        frame_energies(snips, "doc_id", "snip")))
        .select(F.col("id").alias("qid"), F.col("afi").alias("sfi"),
                "hk"))
    votes = (corpus_h.join(F.broadcast(snip_h), "hk")
             .groupBy("qid", F.col("id").alias("did"),
                      (F.col("afi") - F.col("sfi")).alias("offset"))
             .agg(F.count(F.lit(1)).alias("n")))
    best = (votes.groupBy("qid", "did")
            .agg(F.min(F.struct((-F.col("n")).alias("nn"),
                                F.col("offset").alias("o")))
                 .alias("b"))
            .select("qid", "did", (-F.col("b.nn")).alias("score"),
                    F.col("b.o").alias("offset")))
    rk = Window.partitionBy("qid").orderBy(F.desc("score"), "did")
    return (best.withColumn("rank", F.row_number().over(rk))
            .where(F.col("rank") <= _CM_TOPK)
            .select("qid", "rank", "did", "score", "offset"))


def _cm_sql() -> str:
    energies = f"""
  SELECT id, fi,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(
             range(1, length(substr(tx, CAST(fi * {_VAD_FRAME} + 1
                                             AS BIGINT),
                                    {_VAD_FRAME})) + 1),
             i -> CAST(ascii(substr(substr(tx,
                    CAST(fi * {_VAD_FRAME} + 1 AS BIGINT), {_VAD_FRAME}),
                    CAST(i AS BIGINT), 1)) AS BIGINT))),
           (a, b) -> a + b * b) AS e
  FROM (SELECT id, tx, unnest(range(0, nf)) AS fi FROM SRC)"""
    peaks = f"""
  SELECT id, fi, e // {_CM_EBUCKET} AS b
  FROM (SELECT id, fi, e,
               coalesce(lag(e) OVER w, -1) AS ep,
               coalesce(lead(e) OVER w, -1) AS en,
               sum(e) OVER (PARTITION BY id) AS tot_e,
               count(*) OVER (PARTITION BY id) AS nf
        FROM ENERGY
        WINDOW w AS (PARTITION BY id ORDER BY fi))
  WHERE e > ep AND e >= en AND e * nf >= tot_e"""
    hashes = f"""
  SELECT a.id, a.fi AS afi,
         unhex(md5(CAST(a.b AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)
                   || ':' || CAST(t.fi - a.fi AS VARCHAR))) AS hk
  FROM PEAKS a JOIN PEAKS t
    ON t.id = a.id AND t.fi > a.fi AND t.fi <= a.fi + {_CM_DT_MAX}"""
    return f"""
WITH cdocs AS (
  SELECT doc_id AS id, text AS tx,
         CAST((length(text) + {_VAD_FRAME} - 1) // {_VAD_FRAME} AS BIGINT)
             AS nf
  FROM documents WHERE length(text) > 0
),
cen AS ({energies.replace("SRC", "cdocs")}),
cpk AS ({peaks.replace("ENERGY", "cen")}),
ch AS ({hashes.replace("PEAKS", "cpk")}),
sdocs AS (
  SELECT doc_id AS id,
         substr(text, {_CM_SNIP_FIRST * _VAD_FRAME} + 1,
                {_CM_SNIP_FRAMES * _VAD_FRAME}) AS tx
  FROM documents WHERE length(text) > 0 AND doc_id % 97 = 0
  ORDER BY doc_id LIMIT {_CM_NQ}
),
sdocs2 AS (
  SELECT id, tx,
         CAST((length(tx) + {_VAD_FRAME} - 1) // {_VAD_FRAME} AS BIGINT)
             AS nf
  FROM sdocs WHERE length(tx) > 0
),
sen AS ({energies.replace("SRC", "sdocs2")}),
spk AS ({peaks.replace("ENERGY", "sen")}),
sh AS (SELECT id AS qid, afi AS sfi, hk
       FROM ({hashes.replace("PEAKS", "spk")})),
votes AS (
  SELECT s.qid, c.id AS did, c.afi - s.sfi AS off_,
         CAST(count(*) AS BIGINT) AS n
  FROM ch c JOIN sh s ON c.hk = s.hk
  GROUP BY 1, 2, 3
),
best AS (
  SELECT qid, did,
         (min(struct_pack(nn := -n, o := off_))).nn AS nn,
         (min(struct_pack(nn := -n, o := off_))).o AS o
  FROM votes GROUP BY 1, 2
),
ranked AS (
  -- "rank"/"offset" quoted: both are DuckDB reserved words as bare
  -- aliases, and the driver needs these exact column names
  SELECT qid, did, -nn AS score, o AS off2,
         row_number() OVER (PARTITION BY qid
                            ORDER BY -nn DESC, did) AS rnk
  FROM best
)
SELECT qid, CAST(rnk AS INT) AS "rank", did, score, off2 AS "offset"
FROM ranked WHERE rnk <= {_CM_TOPK}
"""


QUERIES["audio_constellation_match"] = (_audio_constellation_match,
                                        _cm_sql())


# ---------------------------------------------------------------------------
# modality_mix_budget (round 9)
# ---------------------------------------------------------------------------
_MIX_TOKEN_RATE = {"jpeg": 170, "png": 170, "wav": 320}  # bytes/token-equiv
_MIX_RATE_DEFAULT = 256  # unmapped formats are PRICED at this rate, not dropped


def _modality_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budget per modality: each media format's
    byte volume converts to TOKEN-EQUIVALENTS at its modality's
    bytes-per-token rate (image patches ≈ 170 B/token, audio frames ≈
    320 B/token — fixed planner constants), and the realized token
    share is compared against a uniform per-format target. The gap
    (over/under budget, e6) is what a mixture scheduler up- or
    down-samples by — the multimodal sibling of
    ``domain_mixture_weights``. Formats OUTSIDE the rate table are
    priced at ``_MIX_RATE_DEFAULT`` (explicit CASE ELSE in both
    engines) rather than silently excluded — a NULL rate would drop
    the format's tokens from share totals while still counting its
    docs/bytes (r9 advice).

    Scale: one metadata scan (bytes come from payload length — no
    decode), one keyed aggregate to the ≤3-format table, broadcast
    1-row total. Exact integers throughout.
    """
    rate = " ".join(f"WHEN '{k}' THEN {v}"
                    for k, v in sorted(_MIX_TOKEN_RATE.items()))
    md = _metadata(spark, sf_dir).select(
        "media_format", "n_bytes",
        F.expr(f"cast(n_bytes as bigint) div"
               f" (CASE media_format {rate}"
               f" ELSE {_MIX_RATE_DEFAULT} END)").alias("tok"))
    per = (md.groupBy("media_format")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_bytes").cast("long").alias("bytes_total"),
                F.sum("tok").cast("long").alias("token_equiv")))
    tot = per.agg(F.sum("token_equiv").alias("t"),
                  F.count(F.lit(1)).alias("nf"))
    return (per.crossJoin(F.broadcast(tot))
            .select("media_format", "n_docs", "bytes_total", "token_equiv",
                    F.expr("(1000000 * token_equiv) div t")
                     .alias("share_e6"),
                    F.expr("(1000000 * token_equiv) div t"
                           " - 1000000 div nf").alias("vs_uniform_e6")))


def _mix_sql() -> str:
    rate = " ".join(f"WHEN '{k}' THEN {v}"
                    for k, v in sorted(_MIX_TOKEN_RATE.items()))
    return f"""
WITH md AS (
  SELECT media_format, n_bytes,
         CAST(n_bytes AS BIGINT)
             // (CASE media_format {rate} ELSE {_MIX_RATE_DEFAULT} END) AS tok
  FROM ({_METADATA_SQL})
),
per AS (
  SELECT media_format, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bytes) AS BIGINT) AS bytes_total,
         CAST(sum(tok) AS BIGINT) AS token_equiv
  FROM md GROUP BY 1
),
tot AS (
  SELECT CAST(sum(token_equiv) AS BIGINT) AS t, count(*) AS nf FROM per
)
SELECT media_format, n_docs, bytes_total, token_equiv,
       (1000000 * token_equiv) // t AS share_e6,
       (1000000 * token_equiv) // t - 1000000 // nf AS vs_uniform_e6
FROM per, tot
"""


QUERIES["modality_mix_budget"] = (_modality_mix_budget, _mix_sql())
