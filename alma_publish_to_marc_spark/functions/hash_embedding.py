"""Feature-hashing document embeddings — content→vector entirely
in-engine (no external encoder): each document becomes a 64-dim hashed
term-frequency vector (the classic hashing trick), L2-normalized, and
the result plugs straight into the similarity stack
(`operators/similarity.py` — same DIM, same banded LSH).

Two queries:

- ``doc_hash_embedding``: the encoder itself, emitted in the
  ``embedding_center_normalize`` CSV convention.
- ``content_neardup_hashed``: end-to-end content near-dup — corpus
  augmented with exact copies (the dedup fixtures' id-offset rule),
  encoded, then banded-LSH paired with exact cosine on candidates.
  Planted copies MUST surface at cosine 1.0, which the oracle row
  asserts structurally (they share identical vectors).

Determinism: dimension = md5-hash of the token (the cross-engine hash
idiom); counts are exact integers; normalization is one fold + one
rounded division per component. Scale: the encoder is one token
explode → 64 map-side-combinable conditional sums per doc — no
shuffle wider than (doc_id → 64 ints); the near-dup pass inherits the
slim-join property of ``embedding_neardup_pairs``.

Scale ordering caveat (measured, not hypothetical): identical
documents produce identical vectors, which share EVERY band bucket —
a group of k verbatim copies yields C(k,2) candidate pairs, so
corpora with large exact-duplicate groups make any LSH near-dup pass
quadratic per group. The correct pipeline order (what
``dedup_pipeline_end2end`` encodes) is exact dedup FIRST (hash
groupBy — linear), then hashed-embedding near-dup over the surviving
representatives; this query intentionally skips that collapse because
its planted copies are the recall fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

HDIM = 64


def _hashed_vectors(docs: DataFrame) -> DataFrame:
    """(doc_id, v: array<double> L2-normalized, rounded 6)."""
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
         .alias("w"))
        .where(F.col("w") != ""))
    dim = F.pmod(F.conv(F.substring(F.md5("w"), 1, 12), 16, 10)
                 .cast("long"), F.lit(HDIM))
    counts = (toks.select("doc_id", dim.alias("d"))
              .groupBy("doc_id")
              .agg(*[F.sum(F.when(F.col("d") == i, 1).otherwise(0))
                     .cast("double").alias(f"c{i}") for i in range(HDIM)]))
    raw = F.array(*[F.col(f"c{i}") for i in range(HDIM)])
    withnorm = counts.select(
        "doc_id", raw.alias("r"),
        F.sqrt(F.aggregate(F.transform(raw, lambda x: x * x),
                           F.lit(0.0), lambda a, x: a + x)).alias("nm"))
    unit = (F.when(F.col("nm") == 0,
                   F.transform("r", lambda x: x * 0.0))
            .otherwise(F.transform(
                "r", lambda x: F.round(x / F.col("nm"), 6) + 0.0)))
    return withnorm.select("doc_id", unit.alias("v"))


def _sql_hashed_vectors(corpus: str = "documents") -> str:
    """DuckDB twin: same 64 conditional sums, same fold-normalize."""
    sums = ", ".join(
        f"CAST(sum(CASE WHEN d = {i} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS c{i}" for i in range(HDIM))
    arr = "[" + ", ".join(f"c{i}" for i in range(HDIM)) + "]"
    return rf"""hv AS (
    SELECT doc_id, {sums}
    FROM (
        SELECT doc_id,
               CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) % {HDIM} AS d
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\s+')) AS w
              FROM {corpus})
        WHERE w <> ''
    ) GROUP BY doc_id
),
vecs AS (
    SELECT doc_id,
           CASE WHEN nm = 0 THEN list_transform(r, x -> x * 0.0)
                ELSE list_transform(r, x -> round(x / nm, 6) + 0.0)
           END AS v
    FROM (
        SELECT doc_id, {arr} AS r,
               sqrt(list_reduce(list_prepend(0.0,
                   list_transform({arr}, x -> x * x)),
                   (a, x) -> a + x)) AS nm
        FROM hv
    )
)"""


def doc_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    vecs = _hashed_vectors(docs)
    return vecs.select(
        "doc_id",
        F.array_join(F.transform("v", lambda x: F.format_number(x, 6)),
                     ",").alias("unit_csv"))


_EMBED_SQL = f"""
WITH {_sql_hashed_vectors()}
SELECT doc_id,
       array_to_string(list_transform(v, x -> format('{{:.6f}}', x)), ',')
           AS unit_csv
FROM vecs
"""


def content_neardup_hashed(spark: SparkSession, sf_dir: str,
                           threshold: float = 0.95) -> DataFrame:
    from ..operators.similarity import embedding_neardup_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    off = F.broadcast(docs.agg((F.max("doc_id") + 1).alias("_off")))
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % 10 == 0).crossJoin(off)
        .select((F.col("doc_id") + F.col("_off")).alias("doc_id"), "text"))
    vecs = _hashed_vectors(corpus)
    return embedding_neardup_pairs(vecs, "doc_id", "v",
                                   threshold=threshold)


def _content_neardup_sql(threshold: float = 0.95) -> str:
    from ..operators.similarity import BAND_PLANES
    from ..operators.similarity_queries import (_sql_bucket, _sql_dot,
                                                _sql_norm)

    bands = " UNION ALL ".join(
        f"SELECT doc_id, v, {band} AS band, "
        f"{_sql_bucket('v', planes)} AS sig FROM vecs"
        for band, planes in enumerate(BAND_PLANES))
    return f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
),
{_sql_hashed_vectors("corpus")},
bands AS ({bands}),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round({_sql_dot('a.v', 'b.v')}
                 / ({_sql_norm('a.v')} * {_sql_norm('b.v')}), 6) AS cosine
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT DISTINCT id_a, id_b, cosine FROM pairs WHERE cosine >= {threshold}
"""


QUERIES = {
    "doc_hash_embedding": (doc_hash_embedding, _EMBED_SQL),
    "content_neardup_hashed": (content_neardup_hashed,
                               _content_neardup_sql()),
}
