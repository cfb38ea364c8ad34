"""Iterative graph clustering for the dedup pipeline: connected
components over near-duplicate candidate pairs → duplicate clusters
with a canonical representative per cluster.

This is the step after pair generation (MinHash/LSH, SimHash,
Levenshtein blocking) in a training-data dedup pipeline: pairs are only
edges; keeping ONE doc per duplicate *cluster* requires the transitive
closure. The reference's closest relative is the bib_part edge table
(`ddl/data_sync_db.sql:82-85`) queried from either side — here we take
the graph semantics to completion.

Algorithm: min-label propagation with pointer jumping (label-of-label),
converging in O(log n) rounds instead of O(diameter). Each round is two
shuffles on a frame that only shrinks; the loop runs on the driver but
all data stays distributed — at 100 TB this is the same shape as
GraphFrames' connected components (alternating large-star/small-star).

The DuckDB oracle computes the same components with a recursive CTE —
one of the few genuinely iterative computations ANSI SQL can express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

_MAX_ROUNDS = 25  # 2^25 ≫ any component diameter after pointer jumping


def _candidate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking edges: same (lang, source), length within ±20 chars.

    The length band is an equi key: ``floor(n_chars/20)`` buckets, with
    the probe side exploded to its own and both adjacent buckets so any
    ±20-char pair shares a (lang, source, bucket) key. This keeps
    candidate pairs near-linear in corpus size — (lang, source) alone
    gives blocks that grow linearly and pair counts that grow
    quadratically at 100×. The exact band stays as residual;
    doc_a < doc_b dedups the pair (each unordered pair meets in exactly
    one bucket, b's own, so the 3-probe explode introduces no dupes)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars",
        F.floor(F.col("n_chars") / 20).alias("bucket"))
    probe = docs.withColumn(
        "bucket", F.explode(F.array(F.col("bucket") - 1, F.col("bucket"),
                                    F.col("bucket") + 1)))
    a, b = probe.alias("a"), docs.alias("b")
    return (a.join(b, ((F.col("a.lang") == F.col("b.lang"))
                       & (F.col("a.source") == F.col("b.source"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a.doc_id") < F.col("b.doc_id"))
                       & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20)))
            .select(F.col("a.doc_id").alias("src"),
                    F.col("b.doc_id").alias("dst")))


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation with path compression over undirected
    edges(src, dst). Returns (node, cluster_id) where cluster_id is the
    smallest node id in the component. Deterministic: min() is
    order-independent.

    Each round's label frame is staged to parquet and read back: the
    loop's self-referential plan must be severed every iteration or
    Catalyst re-analysis grows geometrically (measured ~2×/round by
    round 16 — .checkpoint()/.localCheckpoint() do NOT truncate the
    logical plan here). Parquet staging is also the only cut that works
    unchanged on a real cluster (shared FS / object store), which is how
    GraphFrames paces its own iterative jobs."""
    import shutil
    import uuid
    from urllib.parse import urlparse

    spark = edges.sparkSession
    # stage under the warehouse dir: shared storage on a real cluster
    # (executors write the rounds, so a driver-local tempdir would not
    # be readable back); locally it's the ordinary spark-warehouse dir
    base = spark.conf.get("spark.sql.warehouse.dir")
    workdir = f"{base.rstrip('/')}/_cc_rounds/{uuid.uuid4().hex}"
    local_dir = urlparse(workdir).path if workdir.startswith("file:") \
        else (None if "://" in workdir else workdir)

    def rmtree(name: str) -> None:
        if local_dir is not None:
            shutil.rmtree(f"{local_dir}/{name}" if name else local_dir,
                          ignore_errors=True)

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    und = cut(edges.union(edges.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst"))), "und")
    labels = cut(und.select(F.col("src").alias("node")).distinct()
                 .withColumn("lbl", F.col("node")), "labels-init")

    try:
        # stage the converged result once more so the returned frame's
        # lineage roots at a single file, then drop every intermediate
        result = cut(_propagate(und, labels, cut), "final")
    except BaseException:
        rmtree("")
        raise
    for name in ("und", "labels-init", "labels-0", "labels-1"):
        rmtree(name)
    return result


def _propagate(und: DataFrame, labels: DataFrame, cut) -> DataFrame:
    """One job per round: the staged parquet write IS the convergence
    probe. The changed-label count rides the write job as an observed
    metric (`DataFrame.observe`), so no second pass recomputes the
    lineage, and the per-round plan cut keeps Catalyst re-analysis flat
    (checkpoint()/localCheckpoint() do not truncate the plan here)."""
    from pyspark.sql import Observation

    for rnd in range(_MAX_ROUNDS):
        # 1-hop: smallest label among neighbours
        nbr = (und.join(labels, und.dst == labels.node)
               .groupBy("src").agg(F.min("lbl").alias("nbr_lbl")))
        # pointer jump: label of my current label
        jump = labels.select(F.col("node").alias("lbl"),
                             F.col("lbl").alias("jump_lbl"))
        stepped = (labels
                   .join(nbr, labels.node == nbr.src, "left")
                   .join(jump, "lbl", "left")
                   .select("node", F.col("lbl").alias("old_lbl"),
                           F.least("lbl",
                                   F.coalesce("nbr_lbl", F.col("lbl")),
                                   F.coalesce("jump_lbl", F.col("lbl")))
                           .alias("lbl")))
        obs = Observation(f"cc-round-{rnd}")
        stepped = stepped.observe(
            obs, F.sum((F.col("lbl") != F.col("old_lbl")).cast("long"))
                  .alias("changed"))
        labels = cut(stepped.drop("old_lbl"), f"labels-{rnd % 2}")
        if (obs.get["changed"] or 0) == 0:
            break
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def _neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = connected_components(_candidate_edges(spark, sf_dir))
    sizes = comps.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (comps.join(sizes, "cluster_id")
            .select(F.col("node").alias("doc_id"), "cluster_id",
                    "cluster_size",
                    (F.col("node") == F.col("cluster_id")).alias("is_canonical")))


_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
    SELECT a.doc_id AS src, b.doc_id AS dst
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 20
),
und AS (
    SELECT src, dst FROM pairs
    UNION ALL
    SELECT dst, src FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, und.dst FROM reach JOIN und ON und.src = reach.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
sized AS (
    SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT c.node AS doc_id, c.cluster_id, s.cluster_size,
       c.node = c.cluster_id AS is_canonical
FROM comp c JOIN sized s USING (cluster_id)
"""


def _dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's end product: the corpus with every
    non-canonical cluster member removed (the canonical survivor is the
    min doc_id of each component). Docs outside any candidate pair pass
    through untouched — a left-anti join against the non-canonical set,
    so the big side streams with one shuffle."""
    docs = load(spark, sf_dir, "documents")
    comps = connected_components(_candidate_edges(spark, sf_dir))
    losers = (comps.where(F.col("node") != F.col("cluster_id"))
              .select(F.col("node").alias("doc_id")))
    return (docs.join(losers, "doc_id", "left_anti")
            .select("doc_id", "lang", "source", "n_chars"))


_DEDUP_CANONICAL_SQL = """
WITH RECURSIVE pairs AS (
    SELECT a.doc_id AS src, b.doc_id AS dst
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 20
),
und AS (
    SELECT src, dst FROM pairs
    UNION ALL
    SELECT dst, src FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, und.dst FROM reach JOIN und ON und.src = reach.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE NOT EXISTS (
    SELECT 1 FROM comp c WHERE c.node = d.doc_id AND c.node <> c.cluster_id
)
"""


def _dedup_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete training-data dedup pipeline in one query:
    shingle → MinHash signature → LSH banding → candidate pairs →
    Jaccard verification → connected components → canonical survivor
    per cluster. Every stage is the production-shaped operator (banded
    join, not all-pairs; distributed label propagation, not a driver
    union-find), so the same plan runs at corpus scale."""
    from ..tables import load
    from .dedup_queries import _id_offset, _near_dup_corpus
    from . import dedup as D

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, "doc_id", "text", n=5, threshold=0.5)
    comps = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    losers = (comps.where(F.col("node") != F.col("cluster_id"))
              .select(F.col("node").alias("doc_id")))
    # synthetic copies carry ids >= max(real id)+1 (see dedup_queries);
    # anything below that offset is an original document
    off = _id_offset(load(spark, sf_dir, "documents").select("doc_id"))
    return (corpus.join(losers, "doc_id", "left_anti")
            .crossJoin(off)
            .select("doc_id",
                    (F.col("doc_id") < F.col("_id_off")).alias("is_original")))


def _dedup_pipeline_sql() -> str:
    from .dedup_queries import minhash_pairs_cte

    return f"""
WITH RECURSIVE {minhash_pairs_cte()},
und AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, und.dst FROM reach JOIN und ON und.src = reach.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT c.doc_id,
       c.doc_id < (SELECT max(doc_id) + 1 FROM documents) AS is_original
FROM corpus c
WHERE NOT EXISTS (
    SELECT 1 FROM comp WHERE comp.node = c.doc_id
      AND comp.node <> comp.cluster_id
)
"""


# ---- fixed-point PageRank --------------------------------------------------
PR_SCALE = 1_000_000_000_000  # tera units: integer mass, exact everywhere
PR_ITERS = 2
# supplier node ids are namespaced ABOVE max(custkey)+1, derived from the
# data (a fixed constant would alias customers with suppliers at larger
# scale factors — the same bug class the dedup corpora fixed by deriving
# offsets from max(id)+1)


def pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier bipartite graph (edges =
    distinct (custkey, suppkey) pairs from lineitem⋈orders), PR_ITERS
    power-iteration rounds with damping 0.85 — importance scoring, the
    second iterative graph algorithm class after connected components.

    Fixed-point discipline (the clustering.py recipe): rank mass lives
    in integer tera units; per-round contributions are
    ``floor(pr / deg)`` and the update is
    ``floor(15·S/(100·n)) + floor(85·Σcontrib/100)`` — every quotient
    is a rational with a small denominator, never pathologically close
    to an integer, so the floors are bit-identical across engines (the
    oracle unrolls the same rounds as CTEs). Mass leaks a few units per
    node per round to flooring, which is fine for a RANKING — ordering,
    not conservation, is the contract.

    Scale: each round joins the rank table onto the undirected edge
    list by src (one shuffle) and aggregates contributions by dst
    (map-side combinable) — the standard distributed PageRank; degrees
    ride the same node-keyed join. At 100 TB the driver-paced loop
    stages rounds through parquet cuts exactly like
    :func:`connected_components`; there are no dangling nodes by
    construction (every node enters via an edge).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_suppkey").alias("s"))
          .distinct())
    off = F.broadcast(e0.agg((F.max("c") + F.lit(1)).alias("_off")))
    e0o = e0.crossJoin(off)
    und = (e0o.select(F.col("c").alias("src"),
                      (F.col("s") + F.col("_off")).alias("dst"))
           .unionByName(e0o.select((F.col("s") + F.col("_off")).alias("src"),
                                   F.col("c").alias("dst"))))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    # state carries (node, deg, pr) so each round's contribution join
    # touches ONE table — degree never needs its own join per round
    state = (nodes.crossJoin(nn)
             .select("node", "deg",
                     F.floor(F.lit(PR_SCALE) / F.col("n")).cast("long")
                      .alias("pr")))
    for _ in range(PR_ITERS):
        contrib = (und
                   .join(state.withColumnRenamed("node", "src"), "src")
                   .select("dst",
                           F.floor(F.col("pr") / F.col("deg")).cast("long")
                            .alias("contrib"))
                   .groupBy("dst")
                   .agg(F.sum("contrib").alias("s")))
        state = (nodes.crossJoin(nn)
                 .join(contrib, nodes.node == contrib.dst, "left")
                 .select("node", "deg",
                         (F.floor(F.lit(15 * PR_SCALE) / (100 * F.col("n")))
                          .cast("long")
                          + F.floor(F.coalesce("s", F.lit(0)) * 85 / 100)
                             .cast("long")).alias("pr")))
    return state.crossJoin(off).select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") >= F.col("_off"), "supplier")
         .otherwise("customer").alias("node_type"),
        F.col("pr").alias("pr_tera"),
        F.col("deg").cast("long").alias("degree"))


def _pagerank_sql() -> str:
    ctes = ["""e0 AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)""", """off AS (SELECT max(c) + 1 AS o FROM e0)""", """und AS (
    SELECT c AS src, s + off.o AS dst FROM e0 CROSS JOIN off
    UNION ALL
    SELECT s + off.o AS src, c AS dst FROM e0 CROSS JOIN off
)""", """deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src)""",
        """nodes AS (SELECT src AS node, deg FROM deg)""",
        """nn AS (SELECT count(*) AS n FROM nodes)""",
        f"""p0 AS (
    SELECT node, CAST(floor({PR_SCALE} / n) AS BIGINT) AS pr
    FROM nodes CROSS JOIN nn
)"""]
    for i in range(PR_ITERS):
        ctes.append(f"""c{i + 1} AS (
    SELECT u.dst, CAST(sum(CAST(floor(p.pr / d.deg) AS BIGINT)) AS BIGINT)
               AS s
    FROM und u
    JOIN p{i} p ON u.src = p.node
    JOIN deg d ON u.src = d.src
    GROUP BY u.dst
)""")
        ctes.append(f"""p{i + 1} AS (
    SELECT nodes.node,
           CAST(floor({15 * PR_SCALE} / (100 * nn.n)) AS BIGINT)
           + CAST(floor(coalesce(c{i + 1}.s, 0) * 85 / 100) AS BIGINT) AS pr
    FROM nodes CROSS JOIN nn
    LEFT JOIN c{i + 1} ON nodes.node = c{i + 1}.dst
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT p.node AS node_id,
       CASE WHEN p.node >= off.o THEN 'supplier' ELSE 'customer' END
           AS node_type,
       p.pr AS pr_tera,
       CAST(nodes.deg AS BIGINT) AS degree
FROM p{PR_ITERS} p
JOIN nodes ON p.node = nodes.node
CROSS JOIN off
""")


QUERIES = {
    "neardup_clusters": (_neardup_clusters, _CLUSTERS_SQL),
    "dedup_keep_canonical": (_dedup_keep_canonical, _DEDUP_CANONICAL_SQL),
    "dedup_pipeline_end2end": (_dedup_pipeline_end2end, _dedup_pipeline_sql()),
    "pagerank_fixed_point": (pagerank_fixed_point, _pagerank_sql()),
}
