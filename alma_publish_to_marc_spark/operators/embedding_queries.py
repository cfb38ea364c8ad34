"""Oracle-checked embedding-geometry and quantization analytics over
`embeddings`: binary (sign-bit) quantization retrieval + its recall
gate, Matryoshka truncated-dimension recall curve, k-occurrence
hubness audit, and an anisotropy (mean pairwise cosine) audit.

These are the measurements a vector-platform team runs BEFORE
committing to a representation change: 1-bit codes cut the index 32×
(vs float32) but only if recall holds; Matryoshka prefixes cut FLOPs
4-8× but only if the truncated space still ranks like the full one;
hubness and anisotropy are the geometry diagnostics that predict when
ANN recall will degrade (hub-dominated graphs, collapsed cones).

Reference parity note: the reference pipeline
(/root/reference/marc/helper.py and the publish ETL) has no vector
stack; this family extends the engine's training-data capabilities per
SURVEY.md §2's "beyond-reference" mandate, reusing the fixed LSH/panel
conventions of operators/similarity_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import fan_out, load
from . import similarity as S
from .similarity_queries import (
    _BRUTE_SQL,
    _KNN_GRAPH_SQL,
    _sql_dot,
    _sql_norm,
    _sql_vec,
    KNN_K,
    QUERY_IDS,
    K,
)

QUERIES: dict = {}


# --------------------------------------------------------------------------
# Binary (sign-bit) quantization: 1 bit/dim packed into two 32-bit words
# --------------------------------------------------------------------------
def _bq_word(v, lo: int):
    """Pack dims [lo, lo+32) of ``v`` (1-based slice) into a BIGINT via
    a left fold ``acc*2 + bit`` — identical fold order in both engines,
    so the word is bit-identical (no shift builtins needed)."""
    return F.aggregate(
        F.slice(v, lo, 32),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0))


def _sql_bq_word(v: str, lo: int) -> str:
    hi = lo + 31
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({v}[{lo}:{hi}], x -> CASE WHEN x >= 0 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
            f"(acc, b) -> acc * 2 + b)")


def _bq_codes(emb: DataFrame) -> DataFrame:
    v = S.as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        _bq_word(v, 1).alias("w1"),
        _bq_word(v, 33).alias("w2"))


def _bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: each vector compresses to DIM sign bits
    (two 32-bit words in BIGINTs), distance is the Hamming popcount of
    the XOR — the 32×-smaller index tier below scalar quantization
    (ann_sq_topk). For the fixed probe panel, exact Hamming top-K with
    (dist, vec_id) tie-break.

    Determinism: sign bits and popcounts are exact integers; the fold
    packing is an explicit left fold so both engines produce identical
    words.

    Scale: codes are 16 bytes/vector — at 100 TB of raw vectors the BQ
    index is ~3 TB and the panel probe is a broadcast-join popcount
    scan, no shuffle of the corpus; rank is a per-qid WindowGroupLimit
    (top-K per panel member), never a global sort.
    """
    emb = load(spark, sf_dir, "embeddings")
    codes = _bq_codes(emb)
    q = (codes.where(F.col("vec_id").isin(QUERY_IDS))
         .select(F.col("vec_id").alias("qid"),
                 F.col("w1").alias("q1"), F.col("w2").alias("q2")))
    pairs = (codes.join(F.broadcast(q), codes.vec_id != q.qid)
             .select("qid", "vec_id",
                     (F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
                      + F.bit_count(F.col("w2").bitwiseXOR(F.col("q2"))))
                     .cast("int").alias("hamming")))
    w = Window.partitionBy("qid").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= K)
            .select("qid", F.col("vec_id").alias("neighbor_id"),
                    "hamming", F.col("rank").cast("int").alias("rank")))


_BQ_SQL = f"""
WITH codes AS (
    SELECT vec_id,
           {_sql_bq_word(_sql_vec(), 1)} AS w1,
           {_sql_bq_word(_sql_vec(), 33)} AS w2
    FROM embeddings
),
q AS (SELECT vec_id AS qid, w1 AS q1, w2 AS q2 FROM codes
      WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
pairs AS (
    SELECT q.qid, codes.vec_id,
           CAST(bit_count(xor(codes.w1, q.q1))
                + bit_count(xor(codes.w2, q.q2)) AS INT) AS hamming
    FROM codes JOIN q ON codes.vec_id <> q.qid
),
ranked AS (
    SELECT qid, vec_id AS neighbor_id, hamming,
           row_number() OVER (PARTITION BY qid
                              ORDER BY hamming ASC, vec_id ASC) AS rank
    FROM pairs
)
SELECT qid, neighbor_id, hamming, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {K}
"""


def _bq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the 1-bit index vs the exact cosine scan — the gate
    that decides whether BQ serves directly or only as a pre-filter
    tier in front of a float rerank (same eval shape as
    sq_recall_eval: ground truth only for the fixed probe panel).

    Scale: O(panel × corpus) popcounts + the exact panel scan; both
    sides are broadcast-probe shaped, output is panel-sized.
    """
    emb = load(spark, sf_dir, "embeddings")
    exact = S.brute_force_topk(emb, "vec_id", "embedding", QUERY_IDS, K) \
        .select("qid", "neighbor_id")
    bq = _bq_topk(spark, sf_dir) \
        .select("qid", F.col("neighbor_id").alias("bq_id"))
    joined = (exact
              .join(F.broadcast(bq), (exact.qid == bq.qid)
                    & (exact.neighbor_id == bq.bq_id), "left")
              .drop(bq.qid))
    return joined.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.when(F.col("bq_id").isNotNull(), 1).otherwise(0))
         .alias("bq_hits"),
        F.round(F.sum(F.when(F.col("bq_id").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1)), 4).alias("bq_recall"))


_BQ_RECALL_SQL = f"""
WITH exact AS (SELECT qid, neighbor_id FROM ({_BRUTE_SQL})),
bq AS (SELECT qid, neighbor_id AS bq_id FROM ({_BQ_SQL})),
joined AS (
    SELECT e.qid, e.neighbor_id, b.bq_id
    FROM exact e
    LEFT JOIN bq b ON e.qid = b.qid AND e.neighbor_id = b.bq_id
)
SELECT qid,
       count(*) AS n_exact,
       CAST(sum(CASE WHEN bq_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS bq_hits,
       round(sum(CASE WHEN bq_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 4) AS bq_recall
FROM joined
GROUP BY qid
"""


# --------------------------------------------------------------------------
# Matryoshka truncated-dimension recall curve
# --------------------------------------------------------------------------
MRL_DIMS = (8, 16, 32, 64)


def _prefix_topk(emb: DataFrame, d: int) -> DataFrame:
    # Query-side norm precomputed ONCE on the broadcast panel (r11):
    # saves the norm(qp) fold per pair for free (|panel| rows pay it).
    # The CORPUS-side norm deliberately stays inline: hanging an
    # interpreted-fold column on the stream side measured 15-25%
    # SLOWER here (isolated quiet-host best-of-3, 1.83 → 2.20 s) —
    # with |panel| = 5 the per-pair multiplicity is too low for the
    # materialized projection pass to repay itself, unlike the dense
    # products in embedding_decontamination / content_neardup_hashed.
    v = S.as_double(F.col("embedding"))
    e = emb.select("vec_id", F.slice(v, 1, d).alias("p"))
    q = (e.where(F.col("vec_id").isin(QUERY_IDS))
         .select(F.col("vec_id").alias("qid"), F.col("p").alias("qp"))
         .withColumn("nq", S.norm(F.col("qp"))))
    pairs = (e.join(F.broadcast(q), e.vec_id != q.qid)
             .withColumn("cosine", F.round(
                 S.dot(F.col("p"), F.col("qp"))
                 / (S.norm(F.col("p")) * F.col("nq")), 6)))
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= K)
            .select(F.lit(d).alias("dim"), "qid",
                    F.col("vec_id").alias("neighbor_id")))


def _mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka recall curve: recall@K of cosine retrieval run on the
    first d dimensions only (d in MRL_DIMS) against the full-dim exact
    scan, aggregated over the probe panel. The d=64 row is the
    self-check (recall 1.0); the curve's knee tells the platform how
    far the serving dimension can drop before ranking quality pays.

    Determinism: prefix dot/norm are the module's explicit left folds;
    ranks tie-break on vec_id; recall is an exact rational rounded once.

    Scale: one corpus scan per curve point with a broadcast panel —
    4 scans total here, or one scan materializing all prefixes at
    once if the corpus dominates; output is |MRL_DIMS| rows.
    """
    emb = load(spark, sf_dir, "embeddings")
    exact = S.brute_force_topk(emb, "vec_id", "embedding", QUERY_IDS, K) \
        .select("qid", "neighbor_id")
    # ONE corpus scan + ONE broadcast pair join materializes all curve
    # points (the "one scan materializing all prefixes at once" branch
    # of the scale note): each level's cosine keeps the IDENTICAL
    # per-slice left folds the per-level scans ran — the fold work is
    # unchanged and bit-equal, only the 4x scan + join + per-level
    # window machinery collapses. Query-side prefix norms precompute
    # once on the broadcast panel (the r11 _prefix_topk convention; the
    # corpus side stays inline per the multiplicity note there).
    v = S.as_double(F.col("embedding"))
    e = emb.select("vec_id", v.alias("p"))
    q = (e.where(F.col("vec_id").isin(QUERY_IDS))
         .select(F.col("vec_id").alias("qid"), F.col("p").alias("qp"),
                 F.array(*[S.norm(F.slice(F.col("p"), 1, d))
                           for d in MRL_DIMS]).alias("nqs")))
    lv = F.array(*[
        F.struct(
            F.lit(d).alias("dim"),
            F.round(S.dot(F.slice("p", 1, d), F.slice("qp", 1, d))
                    / (S.norm(F.slice("p", 1, d))
                       * F.element_at("nqs", i + 1)), 6).alias("cosine"))
        for i, d in enumerate(MRL_DIMS)])
    pairs = (e.join(F.broadcast(q), e.vec_id != q.qid)
             .select("vec_id", "qid", F.explode(lv).alias("c"))
             .select("vec_id", "qid", F.col("c.dim").alias("dim"),
                     F.col("c.cosine").alias("cosine")))
    w = Window.partitionBy("dim", "qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    pref = (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= K)
            .select("dim", "qid", F.col("vec_id").alias("neighbor_id")))
    hits = (pref.join(F.broadcast(exact), ["qid", "neighbor_id"], "left_semi")
            .groupBy("dim").agg(F.count(F.lit(1)).alias("hits")))
    # the denominator rides a broadcast 1-row count (the equi-depth /
    # newsvendor idiom) — a driver .count() here would re-execute the
    # whole brute-force pipeline eagerly at plan-build time
    n_exact = F.broadcast(exact.agg(F.count(F.lit(1)).alias("n_exact")))
    return (hits.crossJoin(n_exact).select(
        F.col("dim").cast("int").alias("dim"),
        F.col("hits").cast("long").alias("hits"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(F.col("hits") / F.col("n_exact"), 4).alias("recall")))


def _mrl_sql() -> str:
    def prefix(d: int) -> str:
        pv = f"{_sql_vec()}[1:{d}]"
        dot = (f"list_reduce(list_prepend(0.0, "
               f"list_transform(range(1, {d} + 1), "
               f"i -> e.p[i] * q.qp[i])), (acc, x) -> acc + x)")
        return f"""
SELECT {d} AS dim, q.qid, e.vec_id AS neighbor_id,
       row_number() OVER (PARTITION BY q.qid
           ORDER BY round({dot} / ({_sql_norm('e.p')} * {_sql_norm('q.qp')}),
                          6) DESC, e.vec_id ASC) AS rank
FROM (SELECT vec_id, {pv} AS p FROM embeddings) e
JOIN (SELECT vec_id AS qid, {pv} AS qp FROM embeddings
      WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})) q
  ON e.vec_id <> q.qid
"""
    union = " UNION ALL ".join(
        f"SELECT dim, qid, neighbor_id FROM ({prefix(d)}) WHERE rank <= {K}"
        for d in MRL_DIMS)
    return f"""
WITH exact AS (SELECT qid, neighbor_id FROM ({_BRUTE_SQL})),
pref AS ({union}),
hits AS (
    SELECT dim, count(*) AS hits
    FROM pref p
    WHERE EXISTS (SELECT 1 FROM exact e
                  WHERE e.qid = p.qid AND e.neighbor_id = p.neighbor_id)
    GROUP BY dim
)
SELECT CAST(dim AS INT) AS dim,
       CAST(hits AS BIGINT) AS hits,
       CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
       round(hits / (SELECT count(*) FROM exact), 4) AS recall
FROM hits
"""


# --------------------------------------------------------------------------
# Hubness: k-occurrence (in-degree) distribution of the k-NN graph
# --------------------------------------------------------------------------
def _hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness audit: how often each vector appears in
    other vectors' top-k lists (in-degree of the directed k-NN graph,
    including the zero-degree anti-hubs), reported as the in-degree
    histogram. A heavy right tail (hubs) is the classic
    high-dimensional failure mode that degrades ANN recall and k-NN
    classification — this is the one-number-per-bucket monitor for it.

    Determinism: the k-NN graph is the module's banded-LSH graph with
    (cosine, dst) tie-broken ranks; degrees and the histogram are
    exact counts.

    Scale: reuses knn_graph's banded candidate generation (no
    all-pairs); the degree count is one hash aggregation of E=N·k
    edges; the histogram aggregates N rows. Anti-hubs come from a
    right join against the (pruned, id-only) corpus scan.
    """
    emb = load(spark, sf_dir, "embeddings")
    edges = S.knn_graph(emb, "vec_id", "embedding", k=KNN_K)
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_degree"))
    ids = emb.select(F.col("vec_id").alias("dst"))
    full = (ids.join(indeg, "dst", "left")
            .select(F.coalesce("in_degree", F.lit(0)).alias("in_degree")))
    return (full.groupBy("in_degree")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .select(F.col("in_degree").cast("long").alias("in_degree"),
                    F.col("n_nodes").cast("long").alias("n_nodes")))


_HUBNESS_SQL = f"""
WITH edges AS ({_KNN_GRAPH_SQL}),
indeg AS (SELECT dst, count(*) AS in_degree FROM edges GROUP BY dst),
alldeg AS (
    SELECT coalesce(i.in_degree, 0) AS in_degree
    FROM embeddings e
    LEFT JOIN indeg i ON i.dst = e.vec_id
)
SELECT CAST(in_degree AS BIGINT) AS in_degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM alldeg
GROUP BY in_degree
"""


# --------------------------------------------------------------------------
# Anisotropy: mean pairwise cosine via the mean-vector identity
# --------------------------------------------------------------------------
def _anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy audit: the mean pairwise cosine over ALL vector pairs
    without materializing any pair, via the identity
    sum_{i != j} cos(i,j) = ||sum u_i||^2 - sum ||u_i||^2 with u_i the
    unit-normalized vectors — i.e. N^2·||m||^2 − N·avg||u||^2 where m
    is the mean unit vector. Near-zero means isotropic (healthy for
    cosine retrieval); large positive means the embedding cone has
    collapsed (the common representation-degeneration failure).

    Determinism: the per-dim mean follows embedding_center_normalize's
    convention (posexplode avg rounded to 4 dp in both engines before
    any downstream arithmetic); ||m||^2 is a fold over the 64 rounded
    values; avg||u||^2 rounds to 6 dp. All subsequent arithmetic is on
    the rounded scalars.

    Scale: ONE corpus scan; the per-dim aggregation shuffles 64 rows
    per partition (map-side partials); output is a single row. This is
    the O(N) replacement for the O(N^2) naive audit.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    u = (e.withColumn("nm", S.norm(F.col("v")))
         .where(F.col("nm") > 0)
         .select(F.transform("v", lambda x: x / F.col("nm")).alias("u")))
    stats = u.select(
        F.posexplode("u").alias("pos", "x"),
        # every exploded row of a vector carries its usq, so each pos
        # group holds exactly one usq per vector and avg(usq) per pos
        # equals the per-vector average
        F.aggregate("u", F.lit(0.0), lambda a, x: a + x * x).alias("usq"))
    agg = (stats.groupBy("pos")
           .agg(F.round(F.avg("x"), 4).alias("m"),
                F.round(F.avg("usq"), 6).alias("avg_usq"),
                F.count(F.lit(1)).alias("n"))
           .groupBy()
           .agg(F.round(F.sum(F.col("m") * F.col("m")), 6).alias("msq"),
                F.round(F.avg("avg_usq"), 6).alias("avg_usq"),
                F.max("n").alias("n")))
    return agg.select(
        F.col("n").cast("long").alias("n_vecs"),
        F.col("msq").alias("mean_vec_sq"),
        F.col("avg_usq").alias("avg_unit_sq"),
        F.round((F.col("n") * F.col("msq") - F.col("avg_usq"))
                / (F.col("n") - 1), 6).alias("mean_pairwise_cosine"))


_ANISO_SQL = f"""
WITH e AS (
    SELECT vec_id, {_sql_vec()} AS v, {_sql_norm(_sql_vec())} AS nm
    FROM embeddings
),
u AS (
    SELECT list_transform(v, x -> x / nm) AS u
    FROM e WHERE nm > 0
),
stats AS (
    SELECT t.i AS pos, u[t.i] AS x,
           list_reduce(list_prepend(0.0, list_transform(u, x -> x * x)),
                       (a, x) -> a + x) AS usq
    FROM u, generate_series(1, {S.DIM}) AS t(i)
),
perdim AS (
    SELECT pos, round(avg(x), 4) AS m, round(avg(usq), 6) AS avg_usq,
           count(*) AS n
    FROM stats GROUP BY pos
),
agg AS (
    SELECT round(sum(m * m), 6) AS msq,
           round(avg(avg_usq), 6) AS avg_usq,
           max(n) AS n
    FROM perdim
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       msq AS mean_vec_sq,
       avg_usq AS avg_unit_sq,
       round((n * msq - avg_usq) / (n - 1), 6) AS mean_pairwise_cosine
FROM agg
"""


QUERIES["binary_quantization_topk"] = (_bq_topk, _BQ_SQL)
QUERIES["bq_recall_eval"] = (_bq_recall, _BQ_RECALL_SQL)
QUERIES["matryoshka_recall_curve"] = (_mrl_recall, _mrl_sql())
QUERIES["hubness_koccurrence"] = (_hubness, _HUBNESS_SQL)
QUERIES["embedding_anisotropy_audit"] = (_anisotropy, _ANISO_SQL)


# --------------------------------------------------------------------------
# Blocked Gram matrix X^T X (the distributed primitive under PCA/whitening)
# --------------------------------------------------------------------------
GRAM_SCALE = 10_000


def _gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X^T X over the corpus: every row
    contributes its outer product, map-side combined per partition and
    hash-aggregated on the (i, j) cell key — the one-pass primitive
    that PCA, whitening, and ridge regression start from. Upper
    triangle only (the matrix is symmetric).

    Determinism: components quantize to e4 integers by flooring an
    identical IEEE expression (sq_encode convention); all products and
    sums are exact int64 (|q| <= ~10^4, so a cell sums to < 10^8 per
    row — int64 holds beyond 10^10 rows).

    Scale: ONE corpus scan; each row expands to DIM(DIM+1)/2 cell
    contributions which partial-aggregate map-side down to 2080 cells
    per partition before the only shuffle. At 100 TB this is the
    textbook tree-reduction matmul — no driver state, no collect.
    """
    # fan_out: the DIM(DIM+1)/2-cell expansion below is the whole cost
    # of this query and fuses into the scan — a single-row-group input
    # serializes it on one core (r11 profile: 4.4 s in 1 task).
    emb = fan_out(load(spark, sf_dir, "embeddings"), "vec_id")
    e = emb.select(
        F.expr(f"transform(embedding, "
               f"x -> CAST(floor(CAST(x AS DOUBLE) * {GRAM_SCALE}) "
               f"AS BIGINT))").alias("q"))
    cells = e.select(F.explode(F.expr(
        f"flatten(transform(sequence(1, {S.DIM}), "
        f"i -> transform(sequence(i, {S.DIM}), "
        f"j -> named_struct('i', i, 'j', j, "
        f"'p', q[i - 1] * q[j - 1]))))"))  # Spark [] is 0-based
        .alias("c"))
    return (cells.groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
            .agg(F.sum("c.p").alias("gram"))
            .select(F.col("i").cast("int").alias("i"),
                    F.col("j").cast("int").alias("j"),
                    F.col("gram").cast("long").alias("gram")))


_GRAM_SQL = f"""
WITH e AS (
    SELECT list_transform({_sql_vec()},
               x -> CAST(floor(x * {GRAM_SCALE}) AS BIGINT)) AS q
    FROM embeddings
),
cells AS (
    -- the unnest list is the CONSTANT upper-triangle index set (the
    -- binder rejects outer-column refs inside nested unnest lambdas);
    -- the product reads q in the select
    SELECT t.c.i AS i, t.c.j AS j, q[t.c.i] * q[t.c.j] AS p
    FROM e, unnest(flatten(list_transform(range(1, {S.DIM} + 1),
        i -> list_transform(range(i, {S.DIM} + 1),
        j -> struct_pack(i := i, j := j))))) AS t(c)
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(sum(p) AS BIGINT) AS gram
FROM cells
GROUP BY i, j
"""


# --------------------------------------------------------------------------
# Mahalanobis (diagonal) OOD scoring
# --------------------------------------------------------------------------
OOD_TOP = 20


def _mahalanobis_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution scoring with a diagonal-covariance
    Mahalanobis distance: two stats passes (per-dim mean, then per-dim
    variance about the ROUNDED mean), then a per-row fold
    sum((x-mu)^2 / var) and the global top-OOD_TOP outliers — the
    standard embedding-space OOD monitor in front of a training-data
    intake.

    Determinism: mu rounds to 4 dp and var to 8 dp before any row
    scoring (embedding_center_normalize convention), the score fold is
    an explicit left fold over identical IEEE terms, scores round to
    4 dp, ties break on vec_id.

    Scale: two 64-row stat aggregations + one scan for scoring; the
    top-N is TakeOrdered (distributed heads, no global sort). Stats
    ride broadcasts.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    mu = (e.select(F.posexplode("v").alias("pos", "x"))
          .groupBy("pos").agg(F.round(F.avg("x"), 4).alias("m"))
          .groupBy()
          .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
               .alias("pm"))
          .select(F.transform("pm", lambda s: s["m"]).alias("mu")))
    centered = e.crossJoin(F.broadcast(mu)).select(
        "vec_id",
        F.zip_with("v", "mu", lambda a, b: a - b).alias("c"))
    var = (centered.select(F.posexplode("c").alias("pos", "d"))
           .groupBy("pos")
           .agg(F.round(F.avg(F.col("d") * F.col("d")), 8).alias("s2"))
           .groupBy()
           .agg(F.array_sort(F.collect_list(F.struct("pos", "s2")))
                .alias("ps"))
           .select(F.transform("ps", lambda s: s["s2"]).alias("var")))
    scored = centered.crossJoin(F.broadcast(var)).select(
        "vec_id",
        F.round(F.aggregate(
            F.zip_with("c", "var",
                       lambda d, s2: F.when(s2 > 0, d * d / s2)
                       .otherwise(F.lit(0.0))),
            F.lit(0.0), lambda acc, t: acc + t), 4).alias("maha_sq"))
    return (scored.orderBy(F.col("maha_sq").desc(), F.col("vec_id").asc())
            .limit(OOD_TOP))


_MAHA_SQL = f"""
WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
mu AS (
    SELECT list_transform(
        list_sort(list(struct_pack(pos := pos, m := m))), s -> s.m) AS mu
    FROM (SELECT t.i AS pos, round(avg(v[t.i]), 4) AS m
          FROM e, generate_series(1, {S.DIM}) AS t(i) GROUP BY t.i)
),
centered AS (
    SELECT vec_id,
           list_transform(range(1, {S.DIM} + 1), i -> v[i] - mu[i]) AS c
    FROM e CROSS JOIN mu
),
var AS (
    SELECT list_transform(
        list_sort(list(struct_pack(pos := pos, s2 := s2))), s -> s.s2) AS var
    FROM (SELECT t.i AS pos, round(avg(c[t.i] * c[t.i]), 8) AS s2
          FROM centered, generate_series(1, {S.DIM}) AS t(i) GROUP BY t.i)
),
scored AS (
    SELECT vec_id,
           round(list_reduce(list_prepend(0.0,
               list_transform(range(1, {S.DIM} + 1),
                   i -> CASE WHEN var[i] > 0 THEN c[i] * c[i] / var[i]
                             ELSE 0.0 END)),
               (acc, t) -> acc + t), 4) AS maha_sq
    FROM centered CROSS JOIN var
)
SELECT vec_id, maha_sq FROM scored
ORDER BY maha_sq DESC, vec_id ASC
LIMIT {OOD_TOP}
"""


# --------------------------------------------------------------------------
# k-th-neighbor-distance OOD histogram
# --------------------------------------------------------------------------
def _knn_distance_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based OOD monitor: the cosine to each point's K-th
    nearest neighbor (from the banded-LSH k-NN graph), histogrammed in
    0.1-wide buckets. Points whose K-th neighbor is far (low cosine)
    sit in sparse regions — the local-density OOD signal that
    complements the parametric Mahalanobis one. Points with fewer than
    K LSH candidates land in the -100 bucket (isolated under every
    band — the strongest OOD flag of all).

    Determinism: kth cosine is the rank-K edge of the tie-broken k-NN
    graph; buckets floor a 6-dp-rounded cosine.

    Scale: reuses knn_graph's banded candidates; the kth-edge filter
    and histogram are two cheap aggregations over E = N·K edges.
    """
    emb = load(spark, sf_dir, "embeddings")
    edges = S.knn_graph(emb, "vec_id", "embedding", k=KNN_K)
    kth = (edges.where(F.col("rank") == KNN_K)
           .select(F.col("src").alias("vec_id"),
                   F.floor(F.col("cosine") * 10).cast("long")
                   .alias("bucket")))
    ids = emb.select("vec_id")
    full = (ids.join(kth, "vec_id", "left")
            .select(F.coalesce("bucket", F.lit(-100)).alias("bucket")))
    return (full.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.col("n_nodes").cast("long").alias("n_nodes")))


_KNN_OOD_SQL = f"""
WITH edges AS ({_KNN_GRAPH_SQL}),
kth AS (
    SELECT src AS vec_id,
           CAST(floor(cosine * 10) AS BIGINT) AS bucket
    FROM edges WHERE rank = {KNN_K}
),
alln AS (
    SELECT coalesce(k.bucket, -100) AS bucket
    FROM embeddings e LEFT JOIN kth k ON k.vec_id = e.vec_id
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM alln
GROUP BY bucket
"""


QUERIES["gram_matrix_blocked"] = (_gram_matrix, _GRAM_SQL)
QUERIES["mahalanobis_ood_topn"] = (_mahalanobis_ood, _MAHA_SQL)
QUERIES["knn_distance_ood"] = (_knn_distance_ood, _KNN_OOD_SQL)
