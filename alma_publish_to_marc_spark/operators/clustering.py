"""Iterative k-means (Lloyd) refinement over the embedding corpus —
the quantizer-training step in front of the IVF ANN index
(`operators/similarity.py::ivf_topk` uses fixed seed centroids; this is
the refinement loop that would produce better ones).

Everything runs in **fixed-point integer space** so the computation is
bit-exact across engines and cluster layouts:

- vectors quantize to ``round(x * 1000)`` BIGINT components;
- distances are integer squared-L2 via a deterministic left fold;
- centroid updates are ``floor(sum / count)`` — the sums are exact
  integers and IEEE double division is correctly rounded, so the floor
  is identical everywhere.

Shapes at 100 TB: assignment is a broadcast join (centroid set is tiny
by construction) followed by a WindowGroupLimit argmin — one shuffle by
vec_id; the update is posexplode → groupBy (cell, dim), map-side
combinable, 64·k cells after reduce. Each unrolled iteration is the
same two-exchange pattern; a driver loop (like
``graph_queries.connected_components``) would stage rounds to parquet.

The DuckDB oracle unrolls the same two Lloyd iterations as CTEs — like
the recursive-CTE components oracle, proof the iteration is genuinely
engine-independent arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

Q_SCALE = 1000
DIM = 64
N_ITERS = 2
# spread seed ids (same spirit as similarity_queries.CENTROID_IDS)
SEED_IDS = [10, 40, 70, 100, 130, 160, 190, 220, 250, 280,
            310, 340, 370, 400, 430, 460]


def _quantized(emb: DataFrame) -> DataFrame:
    q = F.transform("embedding",
                    lambda x: F.round(x.cast("double") * Q_SCALE, 0)
                               .cast("long"))
    return emb.select("vec_id", q.alias("v"))


def _sq_dist(a, b):
    """Integer squared-L2, deterministic left fold from 0."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector; ties break to the lowest cent_id.
    Centroids broadcast; rank is WindowGroupLimit (map-side argmin)."""
    scored = (vecs.join(F.broadcast(cents))
              .withColumn("d", _sq_dist(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("vec_id").orderBy("d", "cent_id")
    return (scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select("vec_id", "v", F.col("cent_id").alias("cell")))


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid = element-wise floor-mean in quantized space."""
    comp = assigned.select("cell", F.posexplode("v").alias("pos", "val"))
    agg = (comp.groupBy("cell", "pos")
           .agg(F.floor(F.sum("val") / F.count(F.lit(1))).cast("long")
                .alias("cval")))
    return (agg.groupBy(F.col("cell").alias("cent_id"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"]).alias("cv")))


# Persisted quantized-vector frames, releasable via unpersist_cached()
# (same contract as operators/dedup.py — the persist must outlive the
# lazy consumer, so eager unpersist inside the builders is impossible).
_PERSISTED: list[DataFrame] = []


def unpersist_cached() -> int:
    """Release quantized-vector frames persisted by the k-means paths."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


def _refined_int_cents(emb: DataFrame, seed_ids: list[int],
                       n_iters: int) -> tuple[DataFrame, DataFrame]:
    """(vecs, cents) after n_iters Lloyd rounds, both in quantized
    integer space; vecs is persisted (quantization is HOF compute over
    every component and feeds n_iters+1 assignment passes)."""
    from pyspark import StorageLevel

    vecs = _quantized(emb).persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(vecs)
    cents = (vecs.where(F.col("vec_id").isin(seed_ids))
             .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")))
    for _ in range(n_iters):
        cents = _update(_assign(vecs, cents))
    return vecs, cents


def refined_centroids(emb: DataFrame, seed_ids: list[int] | None = None,
                      n_iters: int = N_ITERS) -> DataFrame:
    """The trained coarse quantizer for :func:`similarity.ivf_topk`:
    (cent_id, cv: array<double>) after ``n_iters`` Lloyd rounds,
    de-quantized back to embedding space (integer/Q_SCALE is a single
    correctly-rounded IEEE division, so both engines produce identical
    doubles)."""
    _, cents = _refined_int_cents(emb, seed_ids or SEED_IDS, n_iters)
    return cents.select(
        "cent_id",
        F.transform("cv", lambda x: x.cast("double") / Q_SCALE).alias("cv"))


def kmeans_refine(emb: DataFrame, seed_ids: list[int],
                  n_iters: int = N_ITERS) -> DataFrame:
    """n_iters Lloyd rounds from data-point seeds; returns per-cell
    size and an integer centroid checksum (sum of cv[d]·(d+1))."""
    vecs, cents = _refined_int_cents(emb, seed_ids, n_iters)
    final = _assign(vecs, cents)
    sizes = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    checksum = cents.select(
        F.col("cent_id").alias("cell"),
        F.aggregate(
            F.zip_with(F.col("cv"),
                       F.sequence(F.lit(1).cast("long"), F.lit(DIM).cast("long")),
                       lambda c, i: c * i),
            F.lit(0).cast("long"), lambda a, x: a + x).alias("centroid_checksum"))
    return sizes.join(F.broadcast(checksum), "cell")


def _kmeans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_refine(load(spark, sf_dir, "embeddings"), SEED_IDS)


_QV = ("list_transform(embedding, "
       f"x -> CAST(round(CAST(x AS DOUBLE) * {Q_SCALE}, 0) AS BIGINT))")
_DIST = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
         f"list_transform(range(1, {DIM} + 1), "
         "i -> (a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i]))), "
         "(x, y) -> x + y)")


def _assign_sql(vec_cte: str, cent_cte: str) -> str:
    return f"""
    SELECT vec_id, v, cell FROM (
        SELECT a.vec_id, a.v, c.cent_id AS cell,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_DIST}, c.cent_id) AS r
        FROM {vec_cte} a CROSS JOIN {cent_cte} c
    ) WHERE r = 1"""


def _update_sql(assign_cte: str) -> str:
    return f"""
    SELECT cell AS cent_id, list(cval ORDER BY pos) AS cv FROM (
        SELECT cell, pos,
               CAST(floor(sum(v[pos]) / count(*)) AS BIGINT) AS cval
        FROM {assign_cte}, unnest(generate_series(1, {DIM})) AS t(pos)
        GROUP BY cell, pos
    ) GROUP BY cell"""


_SEEDS = ", ".join(map(str, SEED_IDS))


def kmeans_cents_cte(n_iters: int = N_ITERS) -> str:
    """CTE chain ``vecs, c0, a0, c1, … c{n_iters}`` whose last table is
    the refined quantized-integer centroid set — composable into other
    oracles (the refined-quantizer IVF query reuses it)."""
    parts = [f"vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings)",
             "c0 AS (SELECT vec_id AS cent_id, v AS cv FROM vecs\n"
             f"       WHERE vec_id IN ({_SEEDS}))"]
    for i in range(n_iters):
        parts.append(f"a{i} AS ({_assign_sql('vecs', f'c{i}')})")
        parts.append(f"c{i + 1} AS ({_update_sql(f'a{i}')})")
    return ",\n".join(parts)


_KMEANS_SQL = f"""
WITH {kmeans_cents_cte()},
a2 AS ({_assign_sql('vecs', 'c2')}),
sizes AS (SELECT cell, count(*) AS n_vecs FROM a2 GROUP BY cell),
checks AS (
    SELECT cent_id AS cell,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {DIM} + 1), i -> cv[i] * i)),
               (x, y) -> x + y) AS centroid_checksum
    FROM c2
)
SELECT sizes.cell, n_vecs, centroid_checksum
FROM sizes JOIN checks USING (cell)
"""


QUERIES = {
    "kmeans_fixed_point": (_kmeans_query, _KMEANS_SQL),
}
