"""Spatial analytics over a synthetic point cloud (round 8).

The driver tables carry no coordinates, so each query derives a
DETERMINISTIC point per event from seeded md5 bits (the repo's
dp_noised_counts idiom — Spark ``conv(substr(md5(s),1,12),16,10)`` ==
DuckDB ``CAST('0x' || substr(md5(s),1,12) AS BIGINT)``), projected onto
an integer [0, SP_SIDE)² grid. Integer coordinates keep every distance
and cell id exact in both engines.

The three queries are the canonical distributed-spatial shapes a 100 TB
geo pipeline runs:

- grid-blocked neighbor join (the spatial self-join: cell = radius, 3×3
  probe — never an all-pairs distance join),
- quadtree tile-pyramid rollup (coarser levels aggregate the BOUNDED
  finer cell table, never re-scan the corpus),
- Getis-Ord-style hotspot scoring on the full cell lattice (bounded
  lattice self-join).

Reference scope: the reference engine has no spatial operators; this
module is part of the beyond-reference large-scale-pipeline surface
(like operators/similarity.py), so no file:line parity citations apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

SP_SIDE = 1024          # integer coordinate space per axis
SP_CELL = 16            # grid-cell edge == neighbor radius
SP_R2 = SP_CELL * SP_CELL
SP_NBR_BUCKET = 8       # histogram bucket width for neighbor counts


def _coord(seed: str, key: str, side: int) -> str:
    """Spark SQL for a deterministic coordinate in [0, side)."""
    return (f"cast(conv(substr(md5(concat('{seed}', cast({key} as string))),"
            f" 1, 12), 16, 10) as bigint) % {side}")


def _coord_duck(seed: str, key: str, side: int) -> str:
    return (f"(CAST('0x' || substr(md5('{seed}' || CAST({key} AS VARCHAR)),"
            f" 1, 12) AS BIGINT) % {side})")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_coord("sx:", "event_id", SP_SIDE)).alias("x"),
        F.expr(_coord("sy:", "event_id", SP_SIDE)).alias("y"))


_POINTS_SQL = f"""
SELECT event_id,
       {_coord_duck("sx:", "event_id", SP_SIDE)} AS x,
       {_coord_duck("sy:", "event_id", SP_SIDE)} AS y
FROM events
"""


# ---------------------------------------------------------------------------
# grid_neighbor_join: radius self-join via grid blocking
# ---------------------------------------------------------------------------


def grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-count distribution of the radius-``SP_CELL`` self-join:
    for every point, how many OTHER points lie within Euclidean
    distance SP_CELL; reported as a bucketed histogram
    (neighbor-count div SP_NBR_BUCKET → point count) so the output is
    bounded regardless of corpus size.

    The join is grid-blocked: cell edge == radius, so every qualifying
    pair shares one of the probe's 3×3 neighbor cells. The probe side
    explodes to 9 cells and hash-joins on the cell id — each directed
    pair (a,b) meets exactly once, in b's home cell. Distance is exact
    integer dx²+dy² ≤ R².

    Scale: candidate pairs are near-linear in corpus size at fixed
    density (9 cells × per-cell occupancy); the join is an equi hash
    join on cell id (shuffle-partitionable, AQE-skew-splittable), never
    a cross join. Zero-neighbor points are kept via a left join of the
    point frame against its own directed counts.
    """
    pts = _points(spark, sf_dir).select(
        "event_id", "x", "y",
        F.expr(f"x div {SP_CELL}").alias("cx"),
        F.expr(f"y div {SP_CELL}").alias("cy"))
    probe = pts.select(
        "event_id", "x", "y",
        F.explode(F.array(*[F.col("cx") + d for d in (-1, 0, 1)]))
         .alias("cx"), "cy").select(
        "event_id", "x", "y", "cx",
        F.explode(F.array(*[F.col("cy") + d for d in (-1, 0, 1)]))
         .alias("cy"))
    a, b = probe.alias("a"), pts.alias("b")
    pairs = a.join(b, ["cx", "cy"]).where(
        (F.col("a.event_id") != F.col("b.event_id"))
        & ((F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
           + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
           <= SP_R2))
    cnt = pairs.groupBy(F.col("a.event_id").alias("event_id")).agg(
        F.count(F.lit(1)).cast("long").alias("nn"))
    per_point = (pts.select("event_id")
                 .join(cnt, "event_id", "left")
                 .select(F.coalesce("nn", F.lit(0)).alias("nn")))
    return (per_point
            .groupBy(F.expr(f"nn div {SP_NBR_BUCKET}").alias("nbr_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.sum("nn").cast("long").alias("sum_neighbors")))


_GRID_NBR_SQL = f"""
WITH pts AS (
  SELECT event_id, x, y, x // {SP_CELL} AS cx, y // {SP_CELL} AS cy
  FROM ({_POINTS_SQL})
),
pairs AS (
  SELECT a.event_id, count(*) AS nn
  FROM pts a JOIN pts b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND a.event_id <> b.event_id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {SP_R2}
  GROUP BY a.event_id
),
per_point AS (
  SELECT coalesce(c.nn, 0) AS nn
  FROM pts p LEFT JOIN pairs c USING (event_id)
)
SELECT nn // {SP_NBR_BUCKET} AS nbr_bucket,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(nn) AS BIGINT) AS sum_neighbors
FROM per_point
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# quadtree_tile_rollup: multi-resolution tile-pyramid build
# ---------------------------------------------------------------------------
QT_BITS = 10            # finest level: 2^10 x 2^10 ... capped by SP_SIDE
QT_LEVELS = (10, 8, 6, 4)   # bits per axis at each pyramid level


def _morton(px: str, py: str, bits: int) -> str:
    """Morton interleave as pure arithmetic (identical in both engines
    modulo the // vs div spelling — callers substitute)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({px} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({py} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def quadtree_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-pyramid build: count points per Morton tile at the finest
    level, then roll coarser levels up from the FINER CELL TABLE (a
    Morton code's high bits are its parent tile — one `div` per level,
    never a corpus re-scan). Per level: tile count, max tile count,
    and the top tile's share of all points (e6-floored) — the tile
    skew a map-rendering or geo-sharding layer needs.

    Scale: ONE corpus scan feeds the finest-level aggregate
    (map-side-combinable to ≤4^10 cells); every coarser level
    aggregates the previous bounded cell table (4^k rows). This is the
    canonical tile-pyramid MapReduce shape.
    """
    shift = SP_SIDE // (1 << QT_BITS)  # coord units per finest tile
    z = _morton(f"(x // {shift})", f"(y // {shift})",
                QT_BITS).replace("//", " div ")
    finest = (_points(spark, sf_dir)
              .select(F.expr(z).alias("tile"))
              .groupBy("tile").agg(F.count(F.lit(1)).alias("c")))
    out = None
    level = finest
    prev_bits = QT_BITS
    for bits in QT_LEVELS:
        # parent tile id = high bits of the child Morton code
        drop = 2 * (prev_bits - bits)
        level = (level.select(
                     F.expr(f"(tile - pmod(tile, {1 << drop}))"
                            f" div {1 << drop}").alias("tile"), "c")
                 .groupBy("tile").agg(F.sum("c").alias("c")))
        stats = level.agg(
            F.lit(bits).alias("level_bits"),
            F.count(F.lit(1)).cast("long").alias("n_tiles"),
            F.max("c").cast("long").alias("max_tile"),
            F.expr("cast(1000000 * max(c) div sum(c) as bigint)")
             .alias("top_share_e6"))
        out = stats if out is None else out.unionByName(stats)
        prev_bits = bits
    return out


def _qt_sql() -> str:
    shift = SP_SIDE // (1 << QT_BITS)
    z = _morton(f"(x // {shift})", f"(y // {shift})", QT_BITS)
    parts = []
    prev = f"(SELECT {z} AS tile, count(*) AS c FROM ({_POINTS_SQL}) GROUP BY 1)"
    prev_bits = QT_BITS
    ctes = [f"l{QT_BITS}_base AS ({prev[1:-1]})"]
    prev_name = f"l{QT_BITS}_base"
    for bits in QT_LEVELS:
        drop = 2 * (prev_bits - bits)
        name = f"l{bits}"
        ctes.append(
            f"{name} AS (SELECT tile // {1 << drop} AS tile,"
            f" CAST(sum(c) AS BIGINT) AS c FROM {prev_name} GROUP BY 1)")
        parts.append(
            f"SELECT {bits} AS level_bits, CAST(count(*) AS BIGINT)"
            f" AS n_tiles, CAST(max(c) AS BIGINT) AS max_tile,"
            f" CAST(1000000 * max(c) // CAST(sum(c) AS BIGINT) AS BIGINT)"
            f" AS top_share_e6 FROM {name}")
        prev_name, prev_bits = name, bits
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# spatial_hotspot_cells: Getis-Ord-style local-cluster scoring
# ---------------------------------------------------------------------------
HOT_CELL = 32           # hotspot lattice cell edge (32x32 lattice)
HOT_TOPK = 10


def spatial_hotspot_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot scan on the FULL cell lattice (empty cells
    included — the statistic is defined over the study area, not the
    observed cells): per cell, the 3×3 neighborhood sum S is scored as
    Gi* = (S − n·x̄) / (s·sqrt((N·n − n²)/(N−1))), n = |neighborhood|
    (truncated at lattice edges), x̄/s from the global lattice moments.
    Top-``HOT_TOPK`` cells by e6-floored score, ties on cell id.

    Determinism: counts and moments are exact integers; the score is
    ONE double expression written identically in both engines, floored
    at e6 before ranking.

    Scale: one corpus scan → ≤1024-cell counts; the lattice (32×32)
    is generated, left-joined with observed counts, and the 3×3
    neighborhood is a lattice self-join — everything after the first
    aggregate runs on the bounded lattice. TakeOrdered emits the
    top-K; no global sort of corpus-sized data anywhere.
    """
    side = SP_SIDE // HOT_CELL
    n_cells = side * side
    obs = (_points(spark, sf_dir)
           .select(F.expr(f"x div {HOT_CELL}").alias("cx"),
                   F.expr(f"y div {HOT_CELL}").alias("cy"))
           .groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("c")))
    lattice = (spark.range(n_cells)
               .select(F.expr(f"id div {side}").alias("cx"),
                       F.expr(f"id % {side}").alias("cy"))
               .join(obs, ["cx", "cy"], "left")
               .select("cx", "cy", F.coalesce("c", F.lit(0)).alias("c")))
    moments = F.broadcast(lattice.agg(
        F.sum("c").cast("long").alias("t"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss")))
    nb = lattice.select(F.col("cx").alias("nx"), F.col("cy").alias("ny"),
                        F.col("c").alias("nc"))
    hood = (lattice.join(
                nb,
                (F.abs(F.col("cx") - F.col("nx")) <= 1)
                & (F.abs(F.col("cy") - F.col("ny")) <= 1))
            .groupBy("cx", "cy")
            .agg(F.sum("nc").cast("long").alias("s"),
                 F.count(F.lit(1)).cast("long").alias("n")))
    gi = ("cast(floor(1000000 * (s - n * (cast(t as double) / "
          f"{n_cells})) / (sqrt(cast(ss as double) / {n_cells}"
          f" - (cast(t as double) / {n_cells}) * (cast(t as double) / "
          f"{n_cells})) * sqrt((cast(n as double) * ({n_cells} - n)) / "
          f"({n_cells} - 1)))) as bigint)")
    return (hood.crossJoin(moments)
            .select("cx", "cy", "s", F.expr(gi).alias("gi_e6"))
            .orderBy(F.col("gi_e6").desc(), F.col("cx").asc(),
                     F.col("cy").asc())
            .limit(HOT_TOPK))


def _hotspot_sql() -> str:
    side = SP_SIDE // HOT_CELL
    n_cells = side * side
    gi = ("CAST(floor(1000000 * (s - n * (CAST(t AS DOUBLE) / "
          f"{n_cells})) / (sqrt(CAST(ss AS DOUBLE) / {n_cells}"
          f" - (CAST(t AS DOUBLE) / {n_cells}) * (CAST(t AS DOUBLE) / "
          f"{n_cells})) * sqrt((CAST(n AS DOUBLE) * ({n_cells} - n)) / "
          f"({n_cells} - 1)))) AS BIGINT)")
    return f"""
WITH obs AS (
  SELECT x // {HOT_CELL} AS cx, y // {HOT_CELL} AS cy, count(*) AS c
  FROM ({_POINTS_SQL}) GROUP BY 1, 2
),
lattice AS (
  SELECT g.i // {side} AS cx, g.i % {side} AS cy,
         CAST(coalesce(o.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range(0, {n_cells})) AS i) g
  LEFT JOIN obs o ON o.cx = g.i // {side} AND o.cy = g.i % {side}
),
moments AS (
  SELECT CAST(sum(c) AS BIGINT) AS t, CAST(sum(c * c) AS BIGINT) AS ss
  FROM lattice
),
hood AS (
  SELECT l.cx, l.cy, CAST(sum(nb.c) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM lattice l JOIN lattice nb
    ON abs(l.cx - nb.cx) <= 1 AND abs(l.cy - nb.cy) <= 1
  GROUP BY 1, 2
)
SELECT cx, cy, s, {gi} AS gi_e6
FROM hood CROSS JOIN moments
ORDER BY gi_e6 DESC, cx ASC, cy ASC
LIMIT {HOT_TOPK}
"""



# ---------------------------------------------------------------------------
# boruvka_lightest_edges: round 1 of Borůvka MST on the proximity graph
# ---------------------------------------------------------------------------
BV_WBUCKET = 32         # weight-histogram bucket width (squared distance)


def boruvka_lightest_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 1 of Borůvka's MST over the radius-SP_CELL proximity
    graph: every node selects its LIGHTEST incident edge (weight =
    exact integer squared distance; ties broken by neighbor id via
    struct-min — the CLAUDE.md argmax rule), selections are
    normalized to undirected edges and deduped, and the forest is
    reported as a weight-bucket histogram (bounded output: ≤ R²/bucket
    rows). This is the distributed-MST primitive (each subsequent
    Borůvka round would contract components and repeat — the
    connected_components machinery); round 1 already halves the
    component count and is the hot step at scale.

    Scale: candidate edges come from the same grid-blocked 3×3 probe
    as grid_neighbor_join (near-linear, never all-pairs); the
    lightest-edge pick is one map-side-combinable struct-min per
    node; the dedup is a groupBy on the normalized pair key.
    """
    pts = _points(spark, sf_dir).select(
        "event_id", "x", "y",
        F.expr(f"x div {SP_CELL}").alias("cx"),
        F.expr(f"y div {SP_CELL}").alias("cy"))
    probe = pts.select(
        "event_id", "x", "y",
        F.explode(F.array(*[F.col("cx") + d for d in (-1, 0, 1)]))
         .alias("cx"), "cy").select(
        "event_id", "x", "y", "cx",
        F.explode(F.array(*[F.col("cy") + d for d in (-1, 0, 1)]))
         .alias("cy"))
    a, b = probe.alias("a"), pts.alias("b")
    w = ((F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
         + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y")))
    edges = (a.join(b, ["cx", "cy"])
             .where((F.col("a.event_id") != F.col("b.event_id"))
                    & (w <= SP_R2))
             .select(F.col("a.event_id").alias("src"),
                     F.col("b.event_id").alias("dst"),
                     w.cast("long").alias("w")))
    pick = (edges.groupBy("src")
            .agg(F.min(F.struct("w", "dst")).alias("m"))
            .select("src", F.col("m.w").alias("w"),
                    F.col("m.dst").alias("dst")))
    forest = (pick.select(F.least("src", "dst").alias("u"),
                          F.greatest("src", "dst").alias("v"), "w")
              .groupBy("u", "v").agg(F.min("w").alias("w")))
    return (forest.groupBy(F.expr(f"w div {BV_WBUCKET}").alias("w_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.sum("w").cast("long").alias("sum_w")))


_BORUVKA_SQL = f"""
WITH pts AS (
  SELECT event_id, x, y, x // {SP_CELL} AS cx, y // {SP_CELL} AS cy
  FROM ({_POINTS_SQL})
),
edges AS (
  SELECT a.event_id AS src, b.event_id AS dst,
         CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              AS BIGINT) AS w
  FROM pts a JOIN pts b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND a.event_id <> b.event_id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {SP_R2}
),
pick AS (
  SELECT src,
         (min(struct_pack(w := w, dst := dst))).w AS w,
         (min(struct_pack(w := w, dst := dst))).dst AS dst
  FROM edges GROUP BY src
),
forest AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v, min(w) AS w
  FROM pick GROUP BY 1, 2
)
SELECT w // {BV_WBUCKET} AS w_bucket,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(w) AS BIGINT) AS sum_w
FROM forest
GROUP BY 1
"""




# ---------------------------------------------------------------------------
# two_hop_reachability: bounded BFS frontier expansion from a seed panel
# ---------------------------------------------------------------------------
HOP_SEED_MOD = 101      # seed candidates: event_id % 101 == 0
HOP_SEED_CAP = 32       # panel bounded regardless of corpus size


def two_hop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS frontier sizes at hops 1 and 2 from a deterministic seed
    panel over the radius proximity graph — the bounded multi-hop
    expansion every graph system benchmarks (friend-of-friend reach,
    blast-radius estimates). Per seed: |N1| and |N≤2| (distinct nodes
    within two hops, seed excluded).

    Scale: hop 1 filters the edge list to the seed panel (broadcast
    semi); hop 2 expands ONLY the seeds' wedges (|seeds|·deg² rows,
    never the full wedge set); distinct-union per seed is one keyed
    aggregate. This is the frontier-at-a-time BFS shape — each hop is
    a join against the edge list keyed on the frontier.
    """
    pts = _points(spark, sf_dir).select(
        "event_id", "x", "y",
        F.expr(f"x div {SP_CELL}").alias("cx"),
        F.expr(f"y div {SP_CELL}").alias("cy"))
    probe = pts.select(
        "event_id", "x", "y",
        F.explode(F.array(*[F.col("cx") + d for d in (-1, 0, 1)]))
         .alias("cx"), "cy").select(
        "event_id", "x", "y", "cx",
        F.explode(F.array(*[F.col("cy") + d for d in (-1, 0, 1)]))
         .alias("cy"))
    a, b = probe.alias("a"), pts.alias("b")
    edges = (a.join(b, ["cx", "cy"])
             .where((F.col("a.event_id") != F.col("b.event_id"))
                    & ((F.col("a.x") - F.col("b.x"))
                       * (F.col("a.x") - F.col("b.x"))
                       + (F.col("a.y") - F.col("b.y"))
                       * (F.col("a.y") - F.col("b.y")) <= SP_R2))
             .select(F.col("a.event_id").alias("u"),
                     F.col("b.event_id").alias("v")))
    seeds = (pts.where(F.col("event_id") % HOP_SEED_MOD == 0)
             .select(F.col("event_id").alias("seed"))
             .orderBy("seed").limit(HOP_SEED_CAP))
    h1 = (edges.join(F.broadcast(seeds), edges.u == seeds.seed)
          .select("seed", F.col("v").alias("n")))
    h2 = (h1.join(edges, h1.n == edges.u)
          .where(F.col("v") != F.col("seed"))
          .select("seed", F.col("v").alias("n")))
    reach1 = h1.groupBy("seed").agg(
        F.countDistinct("n").cast("long").alias("n1"))
    reach2 = (h1.unionByName(h2).groupBy("seed")
              .agg(F.countDistinct("n").cast("long").alias("n_le2")))
    return (reach1.join(reach2, "seed")
            .select(F.col("seed").alias("seed_id"), "n1", "n_le2"))


_TWO_HOP_SQL = f"""
WITH pts AS (
  SELECT event_id, x, y, x // {SP_CELL} AS cx, y // {SP_CELL} AS cy
  FROM ({_POINTS_SQL})
),
edges AS (
  SELECT a.event_id AS u, b.event_id AS v
  FROM pts a JOIN pts b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND a.event_id <> b.event_id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {SP_R2}
),
seeds AS (
  SELECT event_id AS seed FROM pts WHERE event_id % {HOP_SEED_MOD} = 0
  ORDER BY seed LIMIT {HOP_SEED_CAP}
),
h1 AS (
  SELECT s.seed, e.v AS n FROM edges e JOIN seeds s ON e.u = s.seed
),
h2 AS (
  SELECT h.seed, e.v AS n
  FROM h1 h JOIN edges e ON h.n = e.u
  WHERE e.v <> h.seed
),
uni AS (SELECT seed, n FROM h1 UNION ALL SELECT seed, n FROM h2)
SELECT r1.seed AS seed_id, r1.n1, r2.n_le2
FROM (SELECT seed, CAST(count(DISTINCT n) AS BIGINT) AS n1
      FROM h1 GROUP BY 1) r1
JOIN (SELECT seed, CAST(count(DISTINCT n) AS BIGINT) AS n_le2
      FROM uni GROUP BY 1) r2 ON r1.seed = r2.seed
"""


QUERIES = {
    "grid_neighbor_join": (grid_neighbor_join, _GRID_NBR_SQL),
    "quadtree_tile_rollup": (quadtree_tile_rollup, _qt_sql()),
    "spatial_hotspot_cells": (spatial_hotspot_cells, _hotspot_sql()),
    "boruvka_lightest_edges": (boruvka_lightest_edges, _BORUVKA_SQL),
    "two_hop_reachability": (two_hop_reachability, _TWO_HOP_SQL),
}


# --------------------------------------------------------------------
# Geometric median via Weiszfeld iterations
# --------------------------------------------------------------------
WZ_ROUNDS = 8
WZ_EPS = 1e-9   # distance guard at a data point (literal, both engines)


def geometric_median_weiszfeld(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Geometric median (the L1-optimal facility location) of the
    event point cloud by {WZ_ROUNDS} Weiszfeld iterations
    x' = Σ(p/d(p)) / Σ(1/d(p)) from the centroid start — the robust
    2-D center the coordinate-wise median twin can't produce (it isn't
    rotation-equivariant). Each round is ONE corpus aggregate with the
    current center as a literal (the k-means driver-paced shape, 1-row
    collect per round); distances are IEEE sqrt of exact-integer
    squared offsets shifted by a literal ε guard — deterministic in
    both engines, oracle unrolled as scalar-subquery CTEs.

    Scale: rounds × one map-side-combinable aggregate; no state beyond
    the 2-double center.
    """
    pts = _points(spark, sf_dir).select("x", "y")
    c = pts.agg((F.sum("x").cast("double")
                 / F.count(F.lit(1)).cast("double")).alias("cx"),
                (F.sum("y").cast("double")
                 / F.count(F.lit(1)).cast("double")).alias("cy")) \
        .collect()[0]
    cx, cy = float(c["cx"]), float(c["cy"])
    n = None
    for _ in range(WZ_ROUNDS):
        d = F.sqrt((F.col("x").cast("double") - cx)
                   * (F.col("x").cast("double") - cx)
                   + (F.col("y").cast("double") - cy)
                   * (F.col("y").cast("double") - cy)) + WZ_EPS
        r = pts.agg(
            F.sum(F.col("x").cast("double") / d).alias("sx"),
            F.sum(F.col("y").cast("double") / d).alias("sy"),
            F.sum(F.lit(1.0) / d).alias("sw"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        cx, cy, n = r["sx"] / r["sw"], r["sy"] / r["sw"], r["n"]
    return spark.createDataFrame(
        [(n, WZ_ROUNDS, int(cx * 1e6 // 1), int(cy * 1e6 // 1))],
        "n_points long, rounds int, med_x_e6 long, med_y_e6 long")


def _weiszfeld_sql() -> str:
    ctes = [f"""pts AS (
  SELECT {_coord_duck('sx:', 'event_id', SP_SIDE)} AS x,
         {_coord_duck('sy:', 'event_id', SP_SIDE)} AS y
  FROM events
)""", """c0 AS MATERIALIZED (
  SELECT CAST(sum(x) AS DOUBLE) / count(*) AS cx,
         CAST(sum(y) AS DOUBLE) / count(*) AS cy
  FROM pts
)"""]
    for i in range(1, WZ_ROUNDS + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""c{i} AS MATERIALIZED (
  SELECT sum(CAST(x AS DOUBLE) / d) / sum(1.0 / d) AS cx,
         sum(CAST(y AS DOUBLE) / d) / sum(1.0 / d) AS cy,
         count(*) AS n
  FROM (SELECT x, y,
               sqrt((CAST(x AS DOUBLE) - (SELECT cx FROM {prev}))
                    * (CAST(x AS DOUBLE) - (SELECT cx FROM {prev}))
                    + (CAST(y AS DOUBLE) - (SELECT cy FROM {prev}))
                      * (CAST(y AS DOUBLE) - (SELECT cy FROM {prev})))
               + {WZ_EPS} AS d
        FROM pts)
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(n AS BIGINT) AS n_points, CAST({WZ_ROUNDS} AS INT) AS rounds,
       CAST(floor(cx * 1e6) AS BIGINT) AS med_x_e6,
       CAST(floor(cy * 1e6) AS BIGINT) AS med_y_e6
FROM c{WZ_ROUNDS}
""")


QUERIES["geometric_median_weiszfeld"] = (geometric_median_weiszfeld,
                                         _weiszfeld_sql())
