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


# --------------------------------------------------------------------------
# Multi-vector late-interaction retrieval (ColBERT-style MaxSim)
# --------------------------------------------------------------------------
MAXSIM_CHUNK_TOKS = 16
MAXSIM_QUERY_DOCS = (0, 1, 2, 3)
MAXSIM_TOPK = 3


def _maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval: every document becomes a BAG of
    chunk vectors (16-token windows, hashed-TF encoded) and a query
    document scores a candidate as Σ_{q-chunk} max_{d-chunk}
    cos(q, d) — the ColBERT MaxSim kernel that beats single-vector
    retrieval when relevance is local (one matching passage) rather
    than global. Output: top-{MAXSIM_TOPK} non-self docs per query
    doc (qdoc, rank, doc_id, score_e6).

    The cosine runs in SPARSE form — chunk vectors live as
    (chunk, dim, count) rows, the dot product is a dim-keyed join of
    the query bag against the corpus rows, norms are per-chunk folds —
    so a chunk costs its nonzero dims, not HDIM, in both engines.
    Each cosine quantizes to e6 micro-units immediately (one
    correctly-rounded division then round-half-away; the clustering
    recipe), so MaxSim and the final sum are pure int64 — no float
    association anywhere.

    Determinism: ties in the final ranking break on doc_id; max/sum
    over ints; the chunker is posexplode div — identical in both
    engines via the positional-unnest idiom.

    Scale: the query bag is panel-sized and broadcast; the corpus
    side shuffles once to (doc, chunk, dim) counts (map-side
    combinable). At 100 TB the dim-keyed join IS the inverted-index
    retrieval plan (posting lists per hashed dim), with MaxSim's
    per-chunk argmax replacing BM25's per-term sum — same skeleton as
    ``inverted_index_build``/``bm25_topk``.
    """
    docs = load(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
         .alias("pos", "w"))
        .where(F.col("w") != ""))
    dim = F.pmod(F.conv(F.substring(F.md5("w"), 1, 12), 16, 10)
                 .cast("long"), F.lit(HDIM))
    cells = (toks.select("doc_id",
                         F.expr(f"pos div {MAXSIM_CHUNK_TOKS}")
                          .alias("chunk"),
                         dim.alias("d"))
             .groupBy("doc_id", "chunk", "d")
             .agg(F.count(F.lit(1)).cast("double").alias("c")))
    norms = (cells.groupBy("doc_id", "chunk")
             .agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nm")))
    corpus = (cells.join(norms, ["doc_id", "chunk"])
              .select("doc_id", "chunk", "d", "c", "nm"))
    qbag = (corpus.where(F.col("doc_id").isin(*MAXSIM_QUERY_DOCS))
            .select(F.col("doc_id").alias("qdoc"),
                    F.col("chunk").alias("qchunk"),
                    "d", F.col("c").alias("qc"),
                    F.col("nm").alias("qnm")))
    dots = (corpus.join(F.broadcast(qbag), "d")
            .where(F.col("doc_id") != F.col("qdoc"))
            .groupBy("qdoc", "qchunk", "qnm", "doc_id", "chunk", "nm")
            .agg(F.sum(F.col("c") * F.col("qc")).alias("dot")))
    cos_e6 = F.expr("cast(round(1000000 * dot / (qnm * nm), 0) as bigint)")
    best = (dots.withColumn("cos_e6", cos_e6)
            .groupBy("qdoc", "qchunk", "doc_id")
            .agg(F.max("cos_e6").alias("mx")))
    scores = (best.groupBy("qdoc", "doc_id")
              .agg(F.sum("mx").alias("score_e6")))
    from pyspark.sql import Window
    w = Window.partitionBy("qdoc").orderBy(F.desc("score_e6"), "doc_id")
    return (scores.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= MAXSIM_TOPK)
            .select("qdoc", F.col("rank").cast("int").alias("rank"),
                    "doc_id", "score_e6"))


_MAXSIM_SQL = rf"""
WITH toks AS (
    SELECT doc_id, s.pos, s.w
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) + 1),
                   i -> struct_pack(w := t[i], pos := i - 1))) AS s
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents)
    ) WHERE s.w <> ''
),
cells AS (
    SELECT doc_id, pos // {MAXSIM_CHUNK_TOKS} AS chunk,
           CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) % {HDIM} AS d,
           CAST(count(*) AS DOUBLE) AS c
    FROM toks
    GROUP BY 1, 2, 3
),
norms AS (
    SELECT doc_id, chunk, sqrt(sum(c * c)) AS nm
    FROM cells GROUP BY 1, 2
),
corpus AS (
    SELECT cells.doc_id, cells.chunk, cells.d, cells.c, norms.nm
    FROM cells JOIN norms USING (doc_id, chunk)
),
qbag AS (
    SELECT doc_id AS qdoc, chunk AS qchunk, d, c AS qc, nm AS qnm
    FROM corpus
    WHERE doc_id IN ({", ".join(map(str, MAXSIM_QUERY_DOCS))})
),
dots AS (
    SELECT q.qdoc, q.qchunk, q.qnm, corpus.doc_id, corpus.chunk,
           corpus.nm, sum(corpus.c * q.qc) AS dot
    FROM corpus JOIN qbag q USING (d)
    WHERE corpus.doc_id <> q.qdoc
    GROUP BY 1, 2, 3, 4, 5, 6
),
best AS (
    SELECT qdoc, qchunk, doc_id,
           max(CAST(round(1000000 * dot / (qnm * nm), 0) AS BIGINT)) AS mx
    FROM dots GROUP BY 1, 2, 3
),
scores AS (
    SELECT qdoc, doc_id, CAST(sum(mx) AS BIGINT) AS score_e6
    FROM best GROUP BY 1, 2
)
SELECT qdoc, CAST(rank AS INT) AS rank, doc_id, score_e6
FROM (
    SELECT qdoc, doc_id, score_e6,
           row_number() OVER (PARTITION BY qdoc
                              ORDER BY score_e6 DESC, doc_id) AS rank
    FROM scores
) WHERE rank <= {MAXSIM_TOPK}
"""

QUERIES["maxsim_multivector_retrieval"] = (_maxsim_retrieval, _MAXSIM_SQL)
