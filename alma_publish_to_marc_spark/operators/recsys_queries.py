"""Item-item collaborative filtering over the order/part bipartite graph.

Beyond-reference family (SURVEY.md §2.12): the co-occurrence
recommender every commerce/retrieval stack runs — "customers whose
orders contained i also bought j" — as a top-k-per-item edge list.
Complements ``market_basket_rules`` (global association rules) with
per-item ranked neighbors, the structure a serving layer actually
indexes.

Cross-engine determinism: similarity scores are EXACT integer
rationals scaled to e6 and floored — ``floor(1e6·c_ij²/(c_i·c_j))``
(squared cosine) and ``floor(1e6·c_ij/(c_i+c_j−c_ij))`` (Jaccard) —
so ranking never compares engine-divergent floats, and ties break on
the neighbor id (CLAUDE.md rank rule).

Scale: baskets come from one distinct over (order, part); the pair
join is per-order bounded (orders hold ≤ ~dozen distinct parts, so
candidates ≈ orders·C(parts_per_order,2) — linear in orders, never a
part×part cross join). Part frequencies are dim-sized and broadcast.
The top-k is a per-src window — WindowGroupLimit prunes to k map-side
before its shuffle. At 100 TB the same plan holds; the only growing
state is the (i,j) pair aggregate, bounded by observed co-occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.tables import load

QUERIES: dict = {}

_TOP_K = 3
_MIN_PAIR = 2  # prune noise pairs (support >= 2 orders)


def _item_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 co-purchase neighbors per part, ranked by squared-cosine
    over order co-occurrence (with Jaccard as a second exact column).

    Scale: see module docstring. The squared-cosine keeps ranking in
    int64 (c_ij ≤ 2^15 at driver scale → 1e6·c_ij² < 2^51; at larger
    corpora drop the 1e6 scale to 1e4 or rank on the raw rational via
    cross-multiplication)."""
    # One explicit shuffle on l_orderkey serves THREE consumers: the
    # (order, part) dedup (partitioning on a key subset satisfies the
    # distinct's clustering), and both sides of the per-order pair
    # self-join (co-partitioned — no further exchange).
    baskets = (load(spark, sf_dir, "lineitem")
               .select("l_orderkey", "l_partkey")
               .repartition("l_orderkey")
               .dropDuplicates(["l_orderkey", "l_partkey"]))
    freq = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("i"))
    b = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("j"))
    pairs = (a.join(b, "ok").where(F.col("i") < F.col("j"))
             .groupBy("i", "j").agg(F.count(F.lit(1)).alias("c_ij"))
             .where(F.col("c_ij") >= _MIN_PAIR))
    mirrored = pairs.unionAll(pairs.select(F.col("j").alias("i"),
                                           F.col("i").alias("j"), "c_ij"))
    fi = freq.select(F.col("l_partkey").alias("i"), F.col("c").alias("c_i"))
    fj = freq.select(F.col("l_partkey").alias("j"), F.col("c").alias("c_j"))
    scored = (mirrored
              .join(F.broadcast(fi), "i").join(F.broadcast(fj), "j")
              .select("i", "j", "c_ij",
                      F.floor(F.lit(1_000_000) * F.col("c_ij") * F.col("c_ij")
                              / (F.col("c_i") * F.col("c_j")))
                       .cast("long").alias("cos2_e6"),
                      F.floor(F.lit(1_000_000) * F.col("c_ij")
                              / (F.col("c_i") + F.col("c_j") - F.col("c_ij")))
                       .cast("long").alias("jaccard_e6")))
    w = Window.partitionBy("i").orderBy(F.desc("cos2_e6"), F.asc("j"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= _TOP_K)
            .select(F.col("i").alias("part_i"), F.col("j").alias("part_j"),
                    F.col("rk").alias("rank"), "c_ij",
                    "cos2_e6", "jaccard_e6"))


_ITEM_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), freq AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY pk
), pairs AS (
  SELECT a.pk AS i, b.pk AS j, CAST(count(*) AS BIGINT) AS c_ij
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING count(*) >= {_MIN_PAIR}
), mirrored AS (
  SELECT i, j, c_ij FROM pairs
  UNION ALL
  SELECT j AS i, i AS j, c_ij FROM pairs
), scored AS (
  SELECT m.i, m.j, m.c_ij,
         CAST(floor(1000000 * m.c_ij * m.c_ij
                    / CAST(fi.c * fj.c AS DOUBLE)) AS BIGINT) AS cos2_e6,
         CAST(floor(1000000 * m.c_ij
                    / CAST(fi.c + fj.c - m.c_ij AS DOUBLE)) AS BIGINT)
             AS jaccard_e6
  FROM mirrored m
  JOIN freq fi ON m.i = fi.pk
  JOIN freq fj ON m.j = fj.pk
)
SELECT i AS part_i, j AS part_j,
       CAST(row_number() OVER (PARTITION BY i
                               ORDER BY cos2_e6 DESC, j ASC) AS INT) AS rank,
       c_ij, cos2_e6, jaccard_e6
FROM scored
QUALIFY rank <= {_TOP_K}
"""

QUERIES["item_item_recs"] = (_item_item_recs, _ITEM_SQL)


# ---------------------------------------------------------------------------
# Personalized recommendations: score unseen parts for a customer cohort
# ---------------------------------------------------------------------------
_REC_CUSTOMERS = 50  # cohort: custkey < 50 (deterministic, scale-stable)


def _personalized_part_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 unseen-part recommendations for a 50-customer cohort:
    each candidate part j scores Σ over the customer's owned parts i
    of the exact co-occurrence cosine² (e6 ints from the item-item
    model), EXCLUDING parts the customer already bought (anti join).

    Scale: the cohort filter prunes customers before anything joins;
    the item-item edge list (top-k per part — already k-bounded) is
    the only model state, joined once per owned part. Ranking sums
    exact int64 scores, ties on part id. This is the standard
    \"user history × item-item matrix\" serving join, expressed as two
    keyed joins + one anti join + a window."""
    owned = (load(spark, sf_dir, "orders")
             .where(F.col("o_custkey") < _REC_CUSTOMERS)
             .select("o_orderkey", "o_custkey")
             .join(load(spark, sf_dir, "lineitem")
                   .select("l_orderkey", "l_partkey"),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .select("o_custkey", "l_partkey").distinct())
    edges = (_item_item_recs(spark, sf_dir)
             .select(F.col("part_i").alias("l_partkey"),
                     F.col("part_j").alias("cand"), "cos2_e6"))
    cand_scores = (owned.join(edges, "l_partkey")
                   .groupBy("o_custkey", "cand")
                   .agg(F.sum("cos2_e6").alias("score_e6"),
                        F.count(F.lit(1)).alias("n_paths")))
    unseen = cand_scores.join(
        owned.select("o_custkey", F.col("l_partkey").alias("cand")),
        ["o_custkey", "cand"], "left_anti")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("score_e6"), F.asc("cand"))
    return (unseen.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= _TOP_K)
            .select(F.col("o_custkey").alias("custkey"),
                    F.col("cand").alias("part"),
                    F.col("rk").alias("rank"), "score_e6", "n_paths"))


_PERS_SQL = f"""
WITH item_recs AS ({_ITEM_SQL.replace(chr(10), chr(10) + '  ')}
), owned AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_custkey < {_REC_CUSTOMERS}
), cand_scores AS (
  SELECT ow.o_custkey, e.part_j AS cand,
         CAST(sum(e.cos2_e6) AS BIGINT) AS score_e6,
         CAST(count(*) AS BIGINT) AS n_paths
  FROM owned ow JOIN item_recs e ON ow.l_partkey = e.part_i
  GROUP BY 1, 2
)
SELECT o_custkey AS custkey, cand AS part,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY score_e6 DESC, cand ASC) AS INT)
           AS rank,
       score_e6, n_paths
FROM cand_scores c
WHERE NOT EXISTS (SELECT 1 FROM owned ow2
                  WHERE ow2.o_custkey = c.o_custkey
                    AND ow2.l_partkey = c.cand)
QUALIFY rank <= {_TOP_K}
"""

QUERIES["personalized_part_recs"] = (_personalized_part_recs, _PERS_SQL)
