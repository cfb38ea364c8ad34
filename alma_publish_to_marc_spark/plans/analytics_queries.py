"""Beyond-reference analytics operators the engine exposes as first-class
queries: the full window-frame function family, a range/interval join,
GROUPING SETS with grouping ids, Levenshtein-blocked near-duplicate
detection, and TF-IDF top-terms — all DuckDB-oracle-checked.

The reference's window usage stops at row_number/lag (SURVEY.md §2.5);
everything here is the "Spark gives it for free" tier a user migrating a
warehouse workload expects. Each DuckDB oracle mirrors the Spark
expressions primitive-for-primitive so value hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load


# --------------------------------------------------------------------------
# window_frame_suite: lead / moving-avg frame / ntile / dense_rank /
# percent_rank / cume_dist / first_value in one pass
# --------------------------------------------------------------------------
def _window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle per distinct partitioning: Catalyst groups the three
    o_custkey windows into a single Window exec after one
    hashpartitioning(o_custkey) exchange; the o_orderpriority ranks get
    their own. Orderings are total (keyed by o_orderkey) so every rank
    and frame is deterministic."""
    orders = load(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_avg = w_seq.rowsBetween(-2, 0)
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.round(F.lead("o_totalprice").over(w_seq), 2).alias("next_price"),
        F.round(F.max("o_totalprice").over(w_avg), 2).alias("frame_max3"),
        F.round(F.first("o_totalprice").over(w_seq), 2).alias("first_price"),
        F.ntile(4).over(w_rank).alias("quartile"),
        F.dense_rank().over(w_rank).alias("price_rank"),
        F.round(F.percent_rank().over(w_rank), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_rank), 6).alias("cume"),
    )


_WINDOW_FRAMES_SQL = """
SELECT o_orderkey,
       o_custkey AS custkey,
       round(lead(o_totalprice) OVER w_seq, 2) AS next_price,
       round(max(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS frame_max3,
       round(first_value(o_totalprice) OVER w_seq, 2) AS first_price,
       CAST(ntile(4) OVER w_rank AS INT) AS quartile,
       CAST(dense_rank() OVER w_rank AS INT) AS price_rank,
       round(percent_rank() OVER w_rank, 6) AS pct_rank,
       round(cume_dist() OVER w_rank, 6) AS cume
FROM orders
WINDOW w_seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_rank AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey)
"""


# --------------------------------------------------------------------------
# range_interval_join: follow-on events within 5 minutes, per user
# --------------------------------------------------------------------------
def _range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self interval join: each event left-joined to the same user's
    events in the next 5 minutes. The equi key (user_id) carries the
    hash join; the time interval is a residual predicate evaluated
    inside the join — no nested-loop, no cartesian. At 100 TB the plan
    holds: one shuffle of each side on user_id, bounded per-key fan-out
    (the interval caps matches). Aggregates are order-independent
    (count/min), so the result hash is stable under any partitioning."""
    events = load(spark, sf_dir, "events")
    a = events.alias("a")
    b = events.alias("b")
    cond = ((F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")))
    return (a.join(b, cond, "left")
            .groupBy(F.col("a.event_id").alias("event_id"))
            .agg(F.count(F.col("b.event_id")).alias("n_follow"),
                 F.min(F.col("b.event_id")).alias("first_follow_id")))


_RANGE_JOIN_SQL = """
SELECT a.event_id,
       count(b.event_id) AS n_follow,
       min(b.event_id) AS first_follow_id
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.event_id
"""


# --------------------------------------------------------------------------
# grouping_sets_revenue: explicit GROUPING SETS + grouping-id mask
# --------------------------------------------------------------------------
def _grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond plain rollup/cube: the four sets here are
    what a reporting layer materializes as separate summary tables; one
    Expand + one aggregate replaces four scans. The grouping-id mask
    disambiguates a real NULL group key from a subtotal row."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    return spark.sql("""
        SELECT n_name AS nation_name, o_orderstatus AS status,
               CAST(grouping(n_name) * 2 + grouping(o_orderstatus) AS INT)
                   AS gid,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM gs_orders o
        JOIN gs_customer c ON o_custkey = c_custkey
        JOIN gs_nation n ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderstatus),
                                (n_name, o_orderstatus), ())
    """)


_GROUPING_SETS_SQL = """
SELECT n_name AS nation_name, o_orderstatus AS status,
       CAST(GROUPING(n_name) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders o
JOIN customer c ON o_custkey = c_custkey
JOIN nation n ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (o_orderstatus),
                        (n_name, o_orderstatus), ())
"""


# --------------------------------------------------------------------------
# levenshtein_neardup: edit-distance near-duplicate pairs, blocked
# --------------------------------------------------------------------------
def _levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking = the scale story: candidate pairs only within the same
    (lang, source) block and ±20 chars of length. The length band is an
    EQUI key, not a residual: docs are bucketed by ``floor(n_chars/20)``
    and the probe side explodes to its own and both adjacent buckets, so
    any pair within ±20 chars shares a (lang, source, bucket) join key.
    Without the bucket key, block size grows linearly with the corpus
    and within-block pairs quadratically; with it, candidates stay
    near-linear (bucket population is corpus-density-, not corpus-
    size-, bound per key). The exact ±20 check remains as residual.
    Distance runs on an 80-char prefix — an upper screen the way
    MinHash bands screen Jaccard."""
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source", "n_chars",
                    F.substring("text", 1, 80).alias("prefix"),
                    F.floor(F.col("n_chars") / 20).alias("bucket")))
    probe = docs.withColumn(
        "bucket", F.explode(F.array(F.col("bucket") - 1, F.col("bucket"),
                                    F.col("bucket") + 1)))
    a = probe.alias("a")
    b = docs.alias("b")
    pair_cond = ((F.col("a.lang") == F.col("b.lang"))
                 & (F.col("a.source") == F.col("b.source"))
                 & (F.col("a.bucket") == F.col("b.bucket"))
                 & (F.col("a.doc_id") < F.col("b.doc_id"))
                 & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20))
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (a.join(b, pair_cond)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    dist.cast("int").alias("edit_distance"))
            .where(F.col("edit_distance") <= 40))


_LEVENSHTEIN_SQL = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS INT)
           AS edit_distance
FROM documents a
JOIN documents b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
 AND abs(a.n_chars - b.n_chars) <= 20
WHERE levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) <= 40
"""


# --------------------------------------------------------------------------
# tfidf_top_terms: per-document top-3 TF-IDF terms
# --------------------------------------------------------------------------
def _tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three aggregations, all map-side combinable: term frequency per
    (doc, term), document frequency per term, corpus size as a 1-row
    broadcast (never a driver-side collect). The final top-3 window is
    planned as WindowGroupLimit — map-side top-k before the shuffle.

    The tf⋈dfreq join is deliberately NOT broadcast: dfreq has one row
    per distinct term in the corpus, which at 100 TB is a 10⁸⁺-row
    vocabulary that would OOM the driver and every executor. Both sides
    are keyed by `term`, so it's pinned to a shuffle sort-merge join
    (AQE skew-split handles stop-word keys); statistics-driven planning
    would re-broadcast here because the sf0.01 vocabulary is tiny, which
    is exactly the estimate that inverts at scale. Only the 1-row n_docs
    aggregate is a guaranteed broadcast."""
    docs = load(spark, sf_dir, "documents")
    toks = (docs.select(
                "doc_id",
                F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                 .alias("term"))
            .where(F.col("term") != ""))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("n_tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc(score), "term")
    return (tf.join(dfreq.hint("merge"), "term")
            .crossJoin(F.broadcast(n_docs))
            .select("doc_id", "term", "n_tf",
                    F.round(score, 4).alias("tfidf"),
                    F.row_number().over(w).alias("rnk"))
            .where(F.col("rnk") <= 3))


_TFIDF_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS n_tf
    FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, n_tf,
       round(n_tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT doc_id, tf.term, n_tf, df, n_docs,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY n_tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, tf.term)
               AS rnk
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# inverted_index_build: postings construction for the retrieval stack
# --------------------------------------------------------------------------
POSTINGS_K = 10


def _inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the indexing half of the retrieval stack
    (bm25_topk is the serving half): per term, document frequency,
    total term frequency, and the top-``POSTINGS_K`` postings (by tf
    desc, doc asc) serialized as a compact string. Real postings lists
    would go to a sink partitioned by term-hash; serializing the head
    keeps the result value-hash comparable.

    Scale: tf is the usual (doc, term) map-side-combined aggregation;
    the per-term top-K is WindowGroupLimit (map-side heads before the
    term shuffle), and the postings string is built by collect_list of
    ALREADY-LIMITED rows — ≤K per term by construction, so no
    unbounded per-group state. Sort inside the collected array is
    explicit (array_sort on a rank-prefixed struct) — collect_list
    order is never trusted."""
    docs = load(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
         .alias("term"))
        .where(F.col("term") != ""))
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = tf.withColumn("rnk", F.row_number().over(w)) \
            .where(F.col("rnk") <= POSTINGS_K)
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("long").alias("total_tf"))
    postings = top.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "doc_id", "tf"))),
                lambda s: F.concat_ws(":", s["doc_id"].cast("string"),
                                      s["tf"].cast("string"))),
            ",").alias("postings_head"))
    return (stats.join(postings, "term")
            .select("term", "df", "total_tf", "postings_head"))


_INVERTED_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents
),
tf AS (
    SELECT term, doc_id, count(*) AS tf
    FROM toks WHERE term <> '' GROUP BY term, doc_id
),
top AS (
    SELECT term, doc_id, tf,
           row_number() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id ASC) AS rnk
    FROM tf QUALIFY rnk <= {POSTINGS_K}
),
stats AS (
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
    FROM tf GROUP BY term
),
postings AS (
    SELECT term,
           array_to_string(
               list_transform(
                   list_sort(list(struct_pack(rnk := rnk, doc_id := doc_id,
                                              tf := tf))),
                   s -> CAST(s.doc_id AS VARCHAR) || ':'
                        || CAST(s.tf AS VARCHAR)),
               ',') AS postings_head
    FROM top GROUP BY term
)
SELECT stats.term, stats.df, stats.total_tf, postings.postings_head
FROM stats JOIN postings USING (term)
"""


# --------------------------------------------------------------------------
# value_histogram: fixed-width histogram (width_bucket)
# --------------------------------------------------------------------------
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 100.0, 10


def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values via width_bucket — the
    profiling primitive behind every distribution dashboard. Bucket
    bounds are literals, so the whole thing is ONE map-side-combined
    aggregation over a scan; out-of-range values land in the 0 /
    buckets+1 sentinel bins per SQL-standard width_bucket semantics.
    DuckDB has no width_bucket builtin, so BOTH engines evaluate the
    same explicit floor formula — textual identity beats relying on
    two implementations agreeing at bucket boundaries."""
    ev = load(spark, sf_dir, "events")
    step = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = (F.when(F.col("value") < HIST_LO, F.lit(0))
              .when(F.col("value") >= HIST_HI, F.lit(HIST_BUCKETS + 1))
              .otherwise(F.floor((F.col("value") - HIST_LO) / step) + 1))
    return (ev.groupBy(bucket.cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("value"), 4).alias("lo_seen"),
                 F.round(F.max("value"), 4).alias("hi_seen")))


_HISTOGRAM_SQL = f"""
SELECT CAST(CASE WHEN value < {HIST_LO} THEN 0
                 WHEN value >= {HIST_HI} THEN {HIST_BUCKETS + 1}
                 ELSE floor((value - {HIST_LO})
                            / {(HIST_HI - HIST_LO) / HIST_BUCKETS}) + 1
            END AS INT) AS bucket,
       count(*) AS n,
       round(min(value), 4) AS lo_seen,
       round(max(value), 4) AS hi_seen
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# range_frame_rolling: time-interval RANGE window frame
# --------------------------------------------------------------------------
def _range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour rolling stats per user via a RANGE frame over
    event-time seconds — the window class rows-frames can't express
    (the frame is defined by VALUE distance, so all ties are peers and
    gaps shrink the frame). Spark's rangeBetween needs a numeric order
    key, so both engines order by integer epoch seconds — exact, and
    tie-order-independent by construction (RANGE includes all peers).
    One window pass = one hash shuffle on user_id."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "value")
    secs = F.unix_micros(F.col("ts").cast("timestamp"))
    sdiv = (secs / 1_000_000).cast("long")
    w = (Window.partitionBy("user_id").orderBy(sdiv)
         .rangeBetween(-3600, 0))
    return ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_trailing_hour"))


_RANGE_FRAME_SQL = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_hour,
       round(sum(value) OVER w, 4) AS sum_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# lateral_topk_per_group: correlated LATERAL subquery (SQL-surface parity)
# --------------------------------------------------------------------------
def _lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation via a correlated LATERAL subquery —
    the SQL-surface form of per-group top-k (Spark 4 and DuckDB both
    execute LATERAL; Spark decorrelates it into the same
    WindowGroupLimit plan the DataFrame window form produces, which is
    the point: a user porting LATERAL SQL keeps both the semantics and
    the scalable plan). Registered from pure SQL to exercise that
    path; the DataFrame twin is first_per_group/max_per_group."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_v n,
        LATERAL (
            SELECT c_name, c_acctbal FROM customer_v c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name ASC LIMIT 2
        ) t
    """)


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
    SELECT c_name, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name ASC LIMIT 2
) t
"""


# --------------------------------------------------------------------------
# event_ewma_features: windowed EWMA / rolling features per user stream
# --------------------------------------------------------------------------
EWMA_ALPHA = 0.7   # per-event decay
EWMA_W = 8         # lag window (bounded => no overflow, frame-local state)


def _ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-stream feature engineering: gap since the
    previous event, rolling mean over the last ``EWMA_W`` events, and a
    windowed EWMA (weights α^j over lags j=0..W-1, renormalized over
    the lags that exist near the stream head).

    Determinism note: every aggregate here is an EXPLICIT left-to-right
    fold over ``lag(value, j)`` columns — never a windowed sum/avg —
    because bounded-frame window aggregates associate differently
    across engines (running vs segment-tree) and double addition isn't
    associative. A lag fold is the same `+` chain in both engines, so
    results are bit-identical before rounding.

    Scale: ONE window pass (partitionBy user, orderBy ts/event_id
    — one hash shuffle on user_id); all W lags share that single sort,
    and the folds are scan-fused codegen. W is a literal, so state per
    row is W values — no unbounded frames, no per-user collect."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(EWMA_W)]
    present = [F.when(lag.isNotNull(), 1.0).otherwise(0.0) for lag in lags]
    num = F.lit(0.0)
    den = F.lit(0.0)
    tot = F.lit(0.0)
    cnt = F.lit(0.0)
    for j, (lag, pres) in enumerate(zip(lags, present)):
        wt = EWMA_ALPHA ** j
        num = num + F.coalesce(lag, F.lit(0.0)) * wt
        den = den + pres * wt
        tot = tot + F.coalesce(lag, F.lit(0.0))
        cnt = cnt + pres
    # exact integer microseconds in both engines (epoch seconds would
    # truncate in Spark but keep fractions in DuckDB)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = (us - F.lag(us).over(w)) / 60_000_000.0
    return ev.select(
        "event_id", "user_id", "ts", "value",
        F.round(gap, 2).alias("gap_minutes"),
        F.round(tot / cnt, 6).alias("roll_mean"),
        F.round(num / den, 6).alias("ewma_value"),
        cnt.cast("int").alias("n_window"))


def _ewma_sql() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w, 0.0) * {EWMA_ALPHA ** j!r}"
        for j in range(EWMA_W))
    den = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN 1.0 "
        f"ELSE 0.0 END) * {EWMA_ALPHA ** j!r}"
        for j in range(EWMA_W))
    tot = " + ".join(
        f"coalesce(lag(value, {j}) OVER w, 0.0)" for j in range(EWMA_W))
    cnt = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN 1.0 "
        f"ELSE 0.0 END)" for j in range(EWMA_W))
    return f"""
SELECT event_id, user_id, ts, value,
       round((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 60000000.0, 2)
           AS gap_minutes,
       round(({tot}) / ({cnt}), 6) AS roll_mean,
       round(({num}) / ({den}), 6) AS ewma_value,
       CAST(({cnt}) AS INT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# bm25_topk: keyword retrieval over the documents corpus
# --------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "merge")
BM25_TOPK = 20


def _bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed query-term set (the ranking
    function of every keyword search engine — Robertson/Sparck Jones
    weights with Lucene's +1 idf floor so scores stay positive).

    Scale: the term filter lands BEFORE the tf aggregation, so only
    posting rows for the |Q| query terms ever reach a shuffle —
    everything else dies in the scan's explode. df is |Q| rows and
    broadcast; N/avgdl is a 1-row broadcast aggregate (token counts are
    integer sums → avgdl is bit-deterministic cross-engine). The final
    top-k is orderBy+limit — Spark plans TakeOrdered (per-partition
    heap + driver merge of k rows), never a global sort. Ranking
    compares the ROUNDED score in both engines so the rank column is
    stable under sub-ulp summation differences.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                     .alias("w")))
    lens = docs.select(
        "doc_id",
        F.size(F.filter("w", lambda t: t != F.lit(""))).alias("dl"))
    tf = (docs.select("doc_id", F.explode("w").alias("term"))
          .where(F.col("term").isin(*BM25_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = lens.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    per_term = idf * (F.col("n_tf") * (BM25_K1 + 1)
                      / (F.col("n_tf")
                         + BM25_K1 * (1 - BM25_B
                                      + BM25_B * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(lens, "doc_id")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                   F.round(F.sum(per_term), 4).alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select("doc_id", "n_terms_matched", "score",
                      F.row_number().over(w).alias("rank"))


_BM25_SQL = rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
lens AS (
    SELECT doc_id, len(list_filter(w, t -> t <> '')) AS dl FROM docs
),
toks AS (SELECT doc_id, unnest(w) AS term FROM docs),
tf AS (
    SELECT doc_id, term, count(*) AS n_tf
    FROM toks WHERE term IN ({", ".join(repr(t) for t in BM25_TERMS)})
    GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
scored AS (
    SELECT tf.doc_id,
           count(*) AS n_terms_matched,
           round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * (n_tf * ({BM25_K1} + 1)
                  / (n_tf + {BM25_K1} * (1 - {BM25_B}
                     + {BM25_B} * dl / avgdl)))), 4) AS score
    FROM tf
    JOIN lens USING (doc_id)
    JOIN dfreq USING (term)
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, n_terms_matched, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


# --------------------------------------------------------------------------
# approx_distinct_bounds: HLL++ sketch vs exact, asserted in-query
# --------------------------------------------------------------------------
def _approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for COUNT(DISTINCT): approx_count_distinct is a
    mergeable HLL++ sketch — one pass, map-side combinable, no
    shuffle-the-world expand like exact distinct. The sketch value
    itself is engine-specific, so the contract exported to the oracle
    is the BOUND: |approx - exact| / exact <= 5% (rsd=0.01 leaves wide
    margin). Spark's HLL is deterministic for fixed data, so the
    boolean is a stable, hashable result."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("approx"))
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("approx") - F.col("exact_users"))
         <= 0.05 * F.col("exact_users")).alias("approx_ok"))


_APPROX_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# array_ops_suite: array HOFs over grouped data
# --------------------------------------------------------------------------
def _array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is order-nondeterministic under shuffle — every
    array here is canonicalized with array_sort before leaving the
    aggregate, the only way grouped arrays can ever be hash-compared
    (or reproducibly written) on a cluster. qty_sum folds the sorted
    array with F.aggregate to exercise the lambda path. Arrays leave
    the query as comma-joined strings: the driver's canonicalizer
    raw-sorts the pandas frame, and ndarray cells crash its lexsort
    (seen live on publish_set_grouping, CORRECTNESS_r05)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.array_sort(F.collect_list(F.col("l_quantity").cast("long")))
    return (li.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).cast("int").alias("n_items"),
                 qty.alias("_qty"),
                 F.array_sort(F.collect_set("l_returnflag")).alias("_flags"))
            .select("l_orderkey", "n_items",
                    F.array_join(F.col("_qty").cast("array<string>"), ",")
                     .alias("qty_sorted"),
                    F.array_join("_flags", ",").alias("flags"),
                    F.array_join(
                        F.slice(F.sort_array(F.col("_qty"), asc=False),
                                1, 2).cast("array<string>"), ",")
                     .alias("qty_top2"),
                    F.aggregate("_qty", F.lit(0).cast("long"),
                                lambda acc, x: acc + x).alias("qty_sum")))


_ARRAY_OPS_SQL = """
SELECT l_orderkey,
       CAST(count(*) AS INT) AS n_items,
       array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',')
           AS qty_sorted,
       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',')
           AS flags,
       array_to_string(list_sort(list(CAST(l_quantity AS BIGINT)),
                                 'DESC')[1:2], ',') AS qty_top2,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_sort(list(CAST(l_quantity AS BIGINT)))),
                   (a, b) -> a + b) AS qty_sum
FROM lineitem GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# recursive_cte_depth: hierarchical walk with Spark 4's WITH RECURSIVE
# --------------------------------------------------------------------------
def _recursive_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4) walking an implicit binary
    hierarchy doc → doc DIV 2 up to the root — the SQL-surface
    counterpart of the reference's bib_part host↔constituent traversal
    (ddl/data_sync_db.sql:82-85). Spark's recursion is UNION ALL-only,
    so this walk is acyclic by construction; cyclic closure lives in
    connected_components (operators/graph_queries.py)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("rc_docs")
    return spark.sql("""
        WITH RECURSIVE walk(doc_id, cur, depth) AS (
            SELECT doc_id, doc_id, 0 FROM rc_docs
            UNION ALL
            SELECT doc_id, cur DIV 2, depth + 1 FROM walk WHERE cur > 1
        )
        SELECT doc_id, max(depth) AS depth_to_root,
               CAST(sum(cur) AS BIGINT) AS path_sum
        FROM walk GROUP BY doc_id
    """)


_RECURSIVE_DEPTH_SQL = """
WITH RECURSIVE walk(doc_id, cur, depth) AS (
    SELECT doc_id, doc_id, 0 FROM documents
    UNION ALL
    SELECT doc_id, cur // 2, depth + 1 FROM walk WHERE cur > 1
)
SELECT doc_id, max(depth) AS depth_to_root,
       CAST(sum(cur) AS BIGINT) AS path_sum
FROM walk GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# unpivot_metrics: wide → long reshaping
# --------------------------------------------------------------------------
def _unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.unpivot (ANSI UNPIVOT): the inverse of pivot_event_counts.
    Values are copied, not recomputed, so the reshape is exact; the
    oracle mirrors with a UNION ALL expansion (portable to engines
    without UNPIVOT)."""
    orders = load(spark, sf_dir, "orders")
    wide = (orders.groupBy("o_orderstatus")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
                 F.round(F.max("o_totalprice"), 2).alias("max_price"),
                 F.round(F.min("o_totalprice"), 2).alias("min_price")))
    return wide.unpivot(["o_orderstatus"],
                        ["sum_price", "max_price", "min_price"],
                        "metric", "val")


_UNPIVOT_SQL = """
WITH wide AS (
    SELECT o_orderstatus,
           round(sum(o_totalprice), 2) AS sum_price,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS val FROM wide
UNION ALL
SELECT o_orderstatus, 'max_price' AS metric, max_price AS val FROM wide
UNION ALL
SELECT o_orderstatus, 'min_price' AS metric, min_price AS val FROM wide
"""


# --------------------------------------------------------------------------
# approx_percentile_bounds: mergeable quantile sketch vs exact, asserted
# --------------------------------------------------------------------------
def _approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for exact group percentiles (group_percentiles):
    percentile_approx is a mergeable sketch — single pass, map-side
    combinable, bounded memory — where exact percentile must sort each
    group. As with the HLL query, the exported contract is the BOUND
    (approx within the observed value range and within 5% rank error ≈
    value tolerance via min/max normalization), asserted in-query; the
    sketch itself is deterministic for fixed data."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(value, 0.5, 1000)").alias("approx_p50"),
        F.min("value").alias("lo"), F.max("value").alias("hi"))
    spread = F.col("hi") - F.col("lo")
    return agg.select(
        "event_type",
        F.round("exact_p50", 4).alias("exact_p50"),
        ((F.abs(F.col("approx_p50") - F.col("exact_p50")) <= 0.05 * spread)
         & (F.col("approx_p50") >= F.col("lo"))
         & (F.col("approx_p50") <= F.col("hi"))).alias("approx_ok"))


_APPROX_PCTL_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS exact_p50,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# asof_prior_event: per-row backward as-of join (pandas merge_asof shape)
# --------------------------------------------------------------------------
def _asof_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general as-of join — every row matched to the most recent
    PRIOR row of a predicate class, not just the partition-global
    latest (OP-J7's window idiom generalized, data_sync_db.sql:504-507).
    A conditional max over an unbounded-preceding-to-1-preceding frame
    does it in ONE shuffle with no self-join at all — the formulation
    that survives 100 TB, where the naive ts-range self-join explodes."""
    events = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior_err = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))).over(w)
    staged = events.select(
        "event_id", "user_id", "event_type", "ts",
        prior_err.alias("prior_error_ts"))
    return staged.select(
        "event_id", "user_id", "event_type", "prior_error_ts",
        F.expr("timestampdiff(MICROSECOND, coalesce(prior_error_ts, ts), ts) "
               "div 1000000").alias("secs_since_error"))


_ASOF_PRIOR_SQL = """
SELECT event_id, user_id, event_type,
       prior_error_ts,
       CAST((epoch_us(ts) - epoch_us(coalesce(prior_error_ts, ts)))
            // 1000000 AS BIGINT) AS secs_since_error
FROM (
    SELECT event_id, user_id, event_type, ts,
           max(CASE WHEN event_type = 'error' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_error_ts
    FROM events
)
"""


# --------------------------------------------------------------------------
# scd2_intervals: slowly-changing-dimension type-2 history from events
# --------------------------------------------------------------------------
def _scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 materialization: each user's event stream becomes validity
    intervals [valid_from, valid_to) with an is_current flag — the
    interval form of the reference's versioned rows + update_date_time
    audit (README.md:77-80). One window shuffle on the key; lead() is
    evaluated map-side after it (WindowExec, no extra exchange)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


_SCD2_SQL = """
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# scd2_point_in_time_join: facts joined to the dimension version valid
# at fact time
# --------------------------------------------------------------------------
def _scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness — the temporal-join discipline feature
    pipelines need to avoid label leakage: each purchase event joins
    the user-state version (built from the user's NON-purchase events,
    compressed to state-change intervals) that was valid at purchase
    time. A purchase before the user's first state interval keeps a
    NULL state (left join) rather than leaking a future version.

    Scale: interval construction is two window passes over one user_id
    shuffle (change-compression then lead()); the PIT join is a user_id
    equi-join with the interval bound as a residual predicate — at
    100 TB both sides are user-bucketed so this co-locates, and an
    AS-OF rewrite (union + window) is the documented alternative when
    versions per user are huge."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim0 = ev.where(F.col("event_type") != "purchase")
    changes = (dim0
               .withColumn("prev", F.lag("event_type").over(w))
               .where(F.col("prev").isNull()
                      | (F.col("event_type") != F.col("prev")))
               .select("user_id", F.col("event_type").alias("state"),
                       F.col("ts").alias("valid_from"), "event_id"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = changes.select(
        "user_id", "state", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"))
    facts = (ev.where(F.col("event_type") == "purchase")
             .select("event_id", "user_id", F.col("ts").alias("purchase_ts")))
    cond = ((facts.user_id == dim.user_id)
            & (facts.purchase_ts >= dim.valid_from)
            & (dim.valid_to.isNull()
               | (facts.purchase_ts < dim.valid_to)))
    return (facts.join(dim, cond, "left")
            .select("event_id", facts.user_id.alias("user_id"),
                    "purchase_ts",
                    F.col("state").alias("state_at_purchase"),
                    F.col("valid_from").alias("state_since")))


_SCD2_PIT_SQL = """
WITH ev AS (
    SELECT event_id, user_id, ts, event_type FROM events
),
changes AS (
    SELECT user_id, event_type AS state, ts AS valid_from, event_id
    FROM (
        SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
        FROM ev WHERE event_type <> 'purchase'
    )
    WHERE prev IS NULL OR event_type <> prev
),
dim AS (
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM changes
),
facts AS (
    SELECT event_id, user_id, ts AS purchase_ts
    FROM ev WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.purchase_ts,
       d.state AS state_at_purchase,
       d.valid_from AS state_since
FROM facts f
LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND f.purchase_ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.purchase_ts < d.valid_to)
"""


# --------------------------------------------------------------------------
# time_gap_fill: dense hourly spine with zero-filled gaps
# --------------------------------------------------------------------------
def _gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-with-gap-fill: per event_type, a dense hourly spine from
    min to max hour (sequence + explode — generated, never collected),
    left-joined to the observed per-hour counts, absent hours = 0. The
    spine side is tiny (types × hours) so Catalyst broadcasts it; the
    count side aggregates map-side before its single shuffle."""
    events = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = (events.groupBy(F.col("event_type"), hour.alias("hour_ts"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    spine = (events.groupBy("event_type")
             .agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
             .select("event_type",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("INTERVAL 1 HOUR")))
                     .alias("hour_ts")))
    return (spine.join(counts, ["event_type", "hour_ts"], "left")
            .select("event_type", "hour_ts",
                    F.coalesce("n_events", F.lit(0)).alias("n_events")))


_GAP_FILL_SQL = """
WITH counts AS (
    SELECT event_type, date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
    SELECT event_type,
           min(date_trunc('hour', ts)) AS h0,
           max(date_trunc('hour', ts)) AS h1
    FROM events GROUP BY event_type
),
spine AS (
    SELECT b.event_type, t.hour_ts
    FROM bounds b,
         unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS t(hour_ts)
)
SELECT s.event_type, s.hour_ts,
       coalesce(c.n_events, 0) AS n_events
FROM spine s
LEFT JOIN counts c
  ON s.event_type = c.event_type AND s.hour_ts = c.hour_ts
"""


# --------------------------------------------------------------------------
# variant_json_extract: Spark 4 VariantType ingestion of semi-structured
# --------------------------------------------------------------------------
def _variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Variant path for semi-structured columns: parse once into
    the binary Variant encoding, then typed try_variant_get extraction —
    the shredded-at-scan successor to get_json_object string re-parsing
    (reference JSON ops: README.md:65, OP-F9/F10)."""
    events = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
        F.isnull(F.try_variant_get(v, "$.missing", "string"))
         .alias("missing_is_null"),
    )


_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events
"""


# --------------------------------------------------------------------------
# hybrid_rank_fusion: reciprocal-rank fusion of lexical (BM25) and
# semantic (embedding-cosine) retrieval
# --------------------------------------------------------------------------
RRF_C = 60                     # the standard RRF damping constant
RRF_SCALE = 1_000_000_000      # integer-scaled 1/(C+rank): exact cross-engine
RRF_SEM_QID = 0                # query vector: embedding of vec_id 0
RRF_LIST_K = 20                # depth of each input ranking
RRF_TOPK = 10


def _hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword ranking and an
    embedding-cosine ranking of the same id space with reciprocal-rank
    fusion, score(d) = Σ_lists 1/(C + rank_d). Ranks-only fusion is the
    production-standard way to combine incomparable scores (BM25 logs
    vs cosine), and the integer-scaled reciprocal (``RRF_SCALE div
    (C + rank)``) keeps the fused score exact int64 in both engines.

    Scale: both input rankings end in a top-``RRF_LIST_K`` (TakeOrdered
    — per-partition heaps, k-row driver merge), so the fusion itself
    joins two k-row frames — trivially broadcast. The expensive parts
    are the upstream retrievals, each already scale-shaped (see
    ``bm25_topk`` / ``ann_cosine_topk``). A missing doc in one list
    contributes 0, the standard RRF union semantics.
    """
    from ..operators import similarity as S

    lex = (_bm25(spark, sf_dir)
           .select("doc_id", F.col("rank").alias("lex_rank")))
    emb = load(spark, sf_dir, "embeddings")
    sem = (S.brute_force_topk(emb, "vec_id", "embedding",
                              [RRF_SEM_QID], k=RRF_LIST_K)
           .select(F.col("neighbor_id").alias("doc_id"),
                   F.col("rank").alias("sem_rank")))
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = F.expr(
        f"coalesce({RRF_SCALE} div ({RRF_C} + lex_rank), 0)"
        f" + coalesce({RRF_SCALE} div ({RRF_C} + sem_rank), 0)")
    w = Window.orderBy(F.desc(rrf), F.asc("doc_id"))
    return (fused.select("doc_id",
                         F.col("lex_rank").cast("int").alias("lex_rank"),
                         F.col("sem_rank").cast("int").alias("sem_rank"),
                         rrf.alias("rrf_score"),
                         F.row_number().over(w).cast("int")
                          .alias("fused_rank"))
            .where(F.col("fused_rank") <= RRF_TOPK))


def _hybrid_fusion_sql() -> str:
    from ..operators.similarity_queries import _sql_dot, _sql_norm, _sql_vec

    return f"""
WITH lex AS (
    SELECT doc_id, rank AS lex_rank FROM ({_BM25_SQL})
),
e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {RRF_SEM_QID}),
sem AS (
    SELECT vec_id AS doc_id, CAST(rank AS INT) AS sem_rank
    FROM (
        SELECT e.vec_id,
               row_number() OVER (
                   ORDER BY round({_sql_dot('q.qv', 'e.v')}
                       / ({_sql_norm('q.qv')} * {_sql_norm('e.v')}), 6) DESC,
                       e.vec_id ASC) AS rank
        FROM e CROSS JOIN q WHERE e.vec_id <> {RRF_SEM_QID}
    ) WHERE rank <= {RRF_LIST_K}
),
fused AS (
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           lex.lex_rank, sem.sem_rank,
           coalesce({RRF_SCALE} // ({RRF_C} + lex.lex_rank), 0)
           + coalesce({RRF_SCALE} // ({RRF_C} + sem.sem_rank), 0) AS rrf_score
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank,
       CAST(sem_rank AS INT) AS sem_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INT)
           AS fused_rank
FROM fused
QUALIFY fused_rank <= {RRF_TOPK}
"""


QUERIES = {
    "window_frame_suite": (_window_frames, _WINDOW_FRAMES_SQL),
    "hybrid_rank_fusion": (_hybrid_fusion, _hybrid_fusion_sql()),
    "approx_distinct_bounds": (_approx_distinct, _APPROX_DISTINCT_SQL),
    "array_ops_suite": (_array_ops, _ARRAY_OPS_SQL),
    "recursive_cte_depth": (_recursive_depth, _RECURSIVE_DEPTH_SQL),
    "unpivot_metrics": (_unpivot, _UNPIVOT_SQL),
    "approx_percentile_bounds": (_approx_percentile, _APPROX_PCTL_SQL),
    "asof_prior_event": (_asof_prior, _ASOF_PRIOR_SQL),
    "scd2_intervals": (_scd2, _SCD2_SQL),
    "time_gap_fill": (_gap_fill, _GAP_FILL_SQL),
    "variant_json_extract": (_variant_extract, _VARIANT_SQL),
    "range_interval_join": (_range_join, _RANGE_JOIN_SQL),
    "grouping_sets_revenue": (_grouping_sets, _GROUPING_SETS_SQL),
    "levenshtein_neardup": (_levenshtein_neardup, _LEVENSHTEIN_SQL),
    "tfidf_top_terms": (_tfidf, _TFIDF_SQL),
    "bm25_topk": (_bm25, _BM25_SQL),
    "event_ewma_features": (_ewma_features, _ewma_sql()),
    "lateral_topk_per_group": (_lateral_topk, _LATERAL_SQL),
    "value_histogram": (_value_histogram, _HISTOGRAM_SQL),
    "inverted_index_build": (_inverted_index, _INVERTED_SQL),
    "scd2_point_in_time_join": (_scd2_pit_join, _SCD2_PIT_SQL),
    "range_frame_rolling": (_range_frame_rolling, _RANGE_FRAME_SQL),
}


# --------------------------------------------------------------------------
# rag_chunk_retrieval: chunk-level BM25 + doc-level semantic fusion
# --------------------------------------------------------------------------
RAG_CHUNK, RAG_STRIDE = 500, 250
RAG_TOPK = 10


def _rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval: overlapping 500-char chunks (the
    ``doc_chunking`` window), BM25 scored at CHUNK granularity for the
    fixed query terms, fused with the document-level embedding-cosine
    ranking via integer RRF — returning the top chunks with full
    provenance (chunk score + both ranks). This is the full
    chunk-index + hybrid-retrieval serving shape; compare
    ``hybrid_rank_fusion`` (doc-level only).

    Scale: chunking is narrow (sequence+explode at scan speed); the
    term filter kills every non-query posting before the tf shuffle;
    df/stats are broadcast 1-to-|Q|-row aggregates; both rank lists
    end in TakeOrdered and the fusion joins two ≤20-row frames. The
    semantic side is the exact scorer here, LSH/IVF at production.
    """
    docs = load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.floor((F.greatest(F.length("text"), F.lit(1)) - 1)
                          / RAG_STRIDE))
    chunk = F.substring(F.col("text"), F.col("chunk_idx") * RAG_STRIDE + 1,
                        RAG_CHUNK)
    chunks = (docs.select("doc_id", F.explode(starts).alias("chunk_idx"))
              .join(docs.select("doc_id", "text"), "doc_id")
              .select("doc_id", F.col("chunk_idx").cast("int")
                      .alias("chunk_idx"),
                      F.split(F.trim(F.lower(chunk)), r"\s+").alias("w")))
    lens = chunks.select(
        "doc_id", "chunk_idx",
        F.size(F.filter("w", lambda t: t != F.lit(""))).alias("dl"))
    tf = (chunks.select("doc_id", "chunk_idx", F.explode("w").alias("term"))
          .where(F.col("term").isin(*BM25_TERMS))
          .groupBy("doc_id", "chunk_idx", "term")
          .agg(F.count(F.lit(1)).alias("n_tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = lens.agg(F.count(F.lit(1)).alias("n_chunks"),
                     F.avg("dl").alias("avgdl"))
    idf = F.log((F.col("n_chunks") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    per_term = idf * (F.col("n_tf") * (BM25_K1 + 1)
                      / (F.col("n_tf")
                         + BM25_K1 * (1 - BM25_B
                                      + BM25_B * F.col("dl")
                                      / F.col("avgdl"))))
    scored = (tf.join(lens, ["doc_id", "chunk_idx"])
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id", "chunk_idx")
              .agg(F.round(F.sum(per_term), 4).alias("chunk_score")))
    lex = (scored.orderBy(F.desc("chunk_score"), F.asc("doc_id"),
                          F.asc("chunk_idx"))
           .limit(RRF_LIST_K)
           .select("doc_id", "chunk_idx", "chunk_score",
                   F.row_number().over(
                       Window.orderBy(F.desc("chunk_score"),
                                      F.asc("doc_id"), F.asc("chunk_idx")))
                    .cast("int").alias("lex_rank")))
    from ..operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    sem = (S.brute_force_topk(emb, "vec_id", "embedding",
                              [RRF_SEM_QID], k=RRF_LIST_K)
           .select(F.col("neighbor_id").alias("doc_id"),
                   F.col("rank").cast("int").alias("sem_rank")))
    fused = lex.join(sem, "doc_id", "left")
    rrf = F.expr(
        f"{RRF_SCALE} div ({RRF_C} + lex_rank)"
        f" + coalesce({RRF_SCALE} div ({RRF_C} + sem_rank), 0)")
    w = Window.orderBy(F.desc(rrf), F.asc("doc_id"), F.asc("chunk_idx"))
    return (fused.select("doc_id", "chunk_idx", "chunk_score", "lex_rank",
                         "sem_rank", rrf.alias("rrf_score"),
                         F.row_number().over(w).cast("int")
                          .alias("fused_rank"))
            .where(F.col("fused_rank") <= RAG_TOPK))


def _rag_sql() -> str:
    from ..operators.similarity_queries import _sql_dot, _sql_norm, _sql_vec

    terms = ", ".join(repr(t) for t in BM25_TERMS)
    return f"""
WITH chunks AS (
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           regexp_split_to_array(trim(lower(
               substr(text, CAST(i * {RAG_STRIDE} + 1 AS BIGINT),
                      {RAG_CHUNK}))), '\\s+') AS w
    FROM documents,
         unnest(generate_series(0,
             CAST(floor((greatest(length(text), 1) - 1) / {RAG_STRIDE})
                  AS BIGINT))) AS t(i)
),
lens AS (
    SELECT doc_id, chunk_idx, len(list_filter(w, t -> t <> '')) AS dl
    FROM chunks
),
tf AS (
    SELECT doc_id, chunk_idx, term, count(*) AS n_tf
    FROM (SELECT doc_id, chunk_idx, unnest(w) AS term FROM chunks)
    WHERE term IN ({terms})
    GROUP BY doc_id, chunk_idx, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n_chunks, avg(dl) AS avgdl FROM lens),
scored AS (
    SELECT tf.doc_id, tf.chunk_idx,
           round(sum(
               ln((n_chunks - df + 0.5) / (df + 0.5) + 1)
               * (n_tf * ({BM25_K1} + 1)
                  / (n_tf + {BM25_K1} * (1 - {BM25_B}
                     + {BM25_B} * dl / avgdl)))), 4) AS chunk_score
    FROM tf
    JOIN lens USING (doc_id, chunk_idx)
    JOIN dfreq USING (term)
    CROSS JOIN stats
    GROUP BY tf.doc_id, tf.chunk_idx
),
lex AS (
    SELECT doc_id, chunk_idx, chunk_score,
           CAST(row_number() OVER (ORDER BY chunk_score DESC, doc_id ASC,
                                   chunk_idx ASC) AS INT) AS lex_rank
    FROM scored
    ORDER BY chunk_score DESC, doc_id ASC, chunk_idx ASC
    LIMIT {RRF_LIST_K}
),
e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {RRF_SEM_QID}),
sem AS (
    SELECT vec_id AS doc_id, CAST(rank AS INT) AS sem_rank
    FROM (
        SELECT e.vec_id,
               row_number() OVER (
                   ORDER BY round({_sql_dot('q.qv', 'e.v')}
                       / ({_sql_norm('q.qv')} * {_sql_norm('e.v')}), 6) DESC,
                       e.vec_id ASC) AS rank
        FROM e CROSS JOIN q WHERE e.vec_id <> {RRF_SEM_QID}
    ) WHERE rank <= {RRF_LIST_K}
),
fused AS (
    SELECT lex.doc_id, lex.chunk_idx, lex.chunk_score, lex.lex_rank,
           sem.sem_rank,
           {RRF_SCALE} // ({RRF_C} + lex.lex_rank)
           + coalesce({RRF_SCALE} // ({RRF_C} + sem.sem_rank), 0)
               AS rrf_score
    FROM lex LEFT JOIN sem ON sem.doc_id = lex.doc_id
)
SELECT doc_id, chunk_idx, chunk_score, lex_rank, sem_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC,
                               chunk_idx ASC) AS INT) AS fused_rank
FROM fused
QUALIFY fused_rank <= {RAG_TOPK}
"""


QUERIES["rag_chunk_retrieval"] = (_rag_chunks, _rag_sql())


# ---------------------------------------------------------------------------
# Positional proximity search (terms within K tokens, positional index)
# ---------------------------------------------------------------------------
_PROX_A, _PROX_B, _PROX_K = "spark", "table", 3


def _proximity_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search — the positional-inverted-index operator behind
    phrase and NEAR/K queries: find documents where two terms occur
    within K token positions, reported as a distance histogram
    (min |posA−posB| per doc → doc counts) plus pair volume.

    Scale: posexplode builds the positional postings; BOTH term
    filters push into the same scan pass, and the pair join is keyed
    on doc_id (positions meet only within a document — never a global
    shuffle). The histogram aggregate is K+1 rows. For a 100 TB corpus
    the postings frame is the thing you'd bucket by term."""
    toks = (load(spark, sf_dir, "documents")
            .select("doc_id", F.posexplode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                .alias("pos", "w")))
    pa = (toks.where(F.col("w") == _PROX_A)
          .select("doc_id", F.col("pos").alias("pa")))
    pb = (toks.where(F.col("w") == _PROX_B)
          .select("doc_id", F.col("pos").alias("pb")))
    pairs = (pa.join(pb, "doc_id")
             .where(F.abs(F.col("pa") - F.col("pb")) <= _PROX_K)
             .select("doc_id",
                     F.abs(F.col("pa") - F.col("pb")).alias("dist")))
    per_doc = (pairs.groupBy("doc_id")
               .agg(F.min("dist").alias("min_dist"),
                    F.count(F.lit(1)).alias("n_pairs")))
    return (per_doc.groupBy("min_dist")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_pairs").alias("total_pairs")))


_PROX_SQL = rf"""
WITH toks AS (
  SELECT doc_id, u.w, CAST(u.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
               i -> struct_pack(w := t[i], pos := i - 1))) AS u
    FROM (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents)
  )
), pairs AS (
  SELECT a.doc_id, abs(a.pos - b.pos) AS dist
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
  WHERE a.w = '{_PROX_A}' AND b.w = '{_PROX_B}'
    AND abs(a.pos - b.pos) <= {_PROX_K}
), per_doc AS (
  SELECT doc_id, min(dist) AS min_dist, CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT min_dist, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pairs) AS BIGINT) AS total_pairs
FROM per_doc GROUP BY 1
"""

QUERIES["proximity_phrase_search"] = (_proximity_phrase_search, _PROX_SQL)


# ---------------------------------------------------------------------------
# Nested build → compute-on-nested → unnest roundtrip (self-verifying)
# ---------------------------------------------------------------------------


def _nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-model handling: nest each order's lineitems into an
    array<struct> column (the shape a document store or denormalized
    gold table carries), compute per-order aggregates ON THE NESTED
    ARRAY with higher-order functions, and verify them against the
    flat groupBy aggregates — the nested and relational views must
    agree exactly (int64 cents/quantities).

    Scale: one keyed collect builds the nested column (sorted by
    linenumber — deterministic layout); the array-side aggregates are
    per-row HOFs with no extra shuffle. The verify join is on the same
    key partitioning. This is the pattern for writing nested parquet
    marts while keeping them provably consistent with the flat fact."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"))
    nested = (li.groupBy("l_orderkey")
              .agg(F.array_sort(F.collect_list(
                  F.struct("l_linenumber", "qty", "price_c"))).alias("items")))
    from_nested = nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.aggregate(F.transform("items", lambda t: t["qty"]),
                    F.lit(0).cast("long"), lambda a, x: a + x)
         .alias("total_qty"),
        F.aggregate(F.transform("items", lambda t: t["price_c"]),
                    F.lit(0).cast("long"), lambda a, x: a + x)
         .alias("total_price_c"))
    flat = (li.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("f_n"),
                 F.sum("qty").alias("f_qty"),
                 F.sum("price_c").alias("f_price")))
    cmp = from_nested.join(flat, "l_orderkey")
    agree = ((F.col("n_items") == F.col("f_n"))
             & (F.col("total_qty") == F.col("f_qty"))
             & (F.col("total_price_c") == F.col("f_price")))
    return cmp.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(agree.cast("int")).cast("long").alias("n_agree"),
        F.sum("total_price_c").alias("grand_total_c"))


_NEST_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
), nested AS (
  SELECT l_orderkey,
         list(struct_pack(l_linenumber := l_linenumber, qty := qty,
                          price_c := price_c)
              ORDER BY l_linenumber, qty, price_c) AS items
  FROM li GROUP BY 1
), from_nested AS (
  SELECT l_orderkey,
         CAST(len(items) AS BIGINT) AS n_items,
         list_reduce(list_prepend(0::BIGINT,
             list_transform(items, t -> t.qty)), (a, x) -> a + x)
             AS total_qty,
         list_reduce(list_prepend(0::BIGINT,
             list_transform(items, t -> t.price_c)), (a, x) -> a + x)
             AS total_price_c
  FROM nested
), flat AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS f_n,
         CAST(sum(qty) AS BIGINT) AS f_qty,
         CAST(sum(price_c) AS BIGINT) AS f_price
  FROM li GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN n.n_items = f.f_n AND n.total_qty = f.f_qty
                      AND n.total_price_c = f.f_price
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(sum(n.total_price_c) AS BIGINT) AS grand_total_c
FROM from_nested n JOIN flat f ON n.l_orderkey = f.l_orderkey
"""

QUERIES["nested_roundtrip"] = (_nested_roundtrip, _NEST_SQL)


# --------------------------------------------------------------------------
# map_ops_suite: MapType pipeline (build -> filter -> transform -> explode)
# --------------------------------------------------------------------------
def _map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark MapType end-to-end: per-user event-type counts become a
    map (map_from_entries over a SORTED entry array — grouped
    collection order is shuffle-nondeterministic, CLAUDE.md), then
    map_filter keeps types seen >= 2x, transform_values boosts them,
    and map_values/size feed per-user totals; the final explode turns
    the map back into rows so the oracle compares plain relations (the
    map is an execution detail, never a compared value). Output:
    (user_id, event_type, boosted, n_types, total_events).

    Scale: one keyed aggregate to (user, type) counts, one to the
    per-user map — both map-side combinable; the HOF map ops are
    scalar expressions on the aggregated rows.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    cnt = (ev.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("c")))
    m = (cnt.groupBy("user_id")
         .agg(F.map_from_entries(
             F.array_sort(F.collect_list(F.struct("event_type", "c"))))
             .alias("m")))
    enriched = m.select(
        "user_id",
        F.map_filter("m", lambda k, v: v >= 2).alias("hot"),
        F.size("m").alias("n_types"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("total_events"))
    boosted = enriched.select(
        "user_id", "n_types", "total_events",
        F.explode(F.transform_values("hot", lambda k, v: 2 * v))
         .alias("event_type", "boosted"))
    return boosted.select("user_id", "event_type", "boosted",
                          "n_types", "total_events")


_MAP_OPS_SQL = """
WITH cnt AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
per_user AS (
    SELECT user_id, CAST(count(*) AS INT) AS n_types,
           CAST(sum(c) AS BIGINT) AS total_events
    FROM cnt GROUP BY 1
)
SELECT c.user_id, c.event_type, 2 * c.c AS boosted,
       u.n_types, u.total_events
FROM cnt c JOIN per_user u ON c.user_id = u.user_id
WHERE c.c >= 2
"""

QUERIES["map_ops_suite"] = (_map_ops, _MAP_OPS_SQL)


# --------------------------------------------------------------------------
# prf_query_expansion: pseudo-relevance feedback (two-pass BM25)
# --------------------------------------------------------------------------
PRF_FEEDBACK_K = 10
PRF_EXPAND = 3


def _prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback — the classic recall lever of keyword
    search: run BM25 for the seed terms, mine the top-{K} "feedback"
    docs for the terms that best characterize them (ranked by
    feedback-doc frequency, corpus-df tiebreak, term tiebreak — pure
    integers, no floats in the SELECTION), append the top-{E} new
    terms to the query, and re-rank the corpus with the expanded term
    set. Output: the expanded-query top-20 with a flag for docs the
    seed query alone would have missed — the measured recall win.
    Columns: (rank, doc_id, score, n_terms_matched, newly_retrieved).

    Determinism: expansion choice is integer-ranked; BM25 scores use
    the same ln + round(4) + id-tiebreak discipline as bm25_topk
    (rank compares the ROUNDED score). Stopword-ish terms are
    excluded by an integer df > N/2 gate.

    Scale: three passes over the scan-fused token explode (seed tf,
    feedback term mining, expanded tf) — each filters BEFORE its
    shuffle (seed/expanded terms via broadcast semi-joins, feedback
    docs a {K}-row broadcast); the corpus-wide df aggregate is the
    tfidf shape (sort-merge on the term key). No global sorts: both
    top-ks are TakeOrdered.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                     .alias("w")))
    lens = docs.select(
        "doc_id",
        F.size(F.filter("w", lambda t: t != F.lit(""))).alias("dl"))
    toks = (docs.select("doc_id", F.explode("w").alias("term"))
            .where(F.col("term") != ""))
    stats = lens.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))

    def bm25_scores(tf):
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5) + 1)
        per_term = idf * (F.col("n_tf") * (BM25_K1 + 1)
                          / (F.col("n_tf")
                             + BM25_K1 * (1 - BM25_B + BM25_B
                                          * F.col("dl") / F.col("avgdl"))))
        return (tf.join(lens, "doc_id")
                .join(F.broadcast(dfreq), "term")
                .crossJoin(F.broadcast(stats))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                     F.round(F.sum(per_term), 4).alias("score")))

    tf1 = (toks.where(F.col("term").isin(*BM25_TERMS))
           .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf")))
    fb = (bm25_scores(tf1)
          .orderBy(F.desc("score"), F.asc("doc_id"))
          .limit(PRF_FEEDBACK_K)
          .select("doc_id", F.lit(1).alias("in_seed_topk")))

    doc_terms = toks.select("doc_id", "term").distinct()
    cdf = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    fterm = (doc_terms.join(F.broadcast(fb.select("doc_id")), "doc_id")
             .groupBy("term").agg(F.count(F.lit(1)).alias("f")))
    cand = (fterm.join(cdf, "term")
            .crossJoin(F.broadcast(stats.select("n_docs")))
            .where(~F.col("term").isin(*BM25_TERMS)
                   & (2 * F.col("df") <= F.col("n_docs"))))
    expansion = (cand.orderBy(F.desc("f"), F.asc("df"), F.asc("term"))
                 .limit(PRF_EXPAND).select("term"))
    qterms = (expansion.unionByName(
        spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")))

    tf2 = (toks.join(F.broadcast(qterms), "term")
           .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf")))
    top = (bm25_scores(tf2)
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.join(F.broadcast(fb), "doc_id", "left")
            .select("doc_id", "n_terms_matched", "score",
                    (F.coalesce("in_seed_topk", F.lit(0)) == 0)
                    .cast("int").alias("newly_retrieved"))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "score", "n_terms_matched",
                    "newly_retrieved"))


def _prf_sql() -> str:
    seed_list = ", ".join(repr(t) for t in BM25_TERMS)
    score = (f"round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)"
             f" * (n_tf * ({BM25_K1} + 1)"
             f" / (n_tf + {BM25_K1} * (1 - {BM25_B}"
             f" + {BM25_B} * dl / avgdl)))), 4)")
    return rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
lens AS (
    SELECT doc_id, len(list_filter(w, t -> t <> '')) AS dl FROM docs
),
toks AS (
    SELECT doc_id, unnest(w) AS term FROM docs
),
toks_ne AS (SELECT doc_id, term FROM toks WHERE term <> ''),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
tf1 AS (
    SELECT doc_id, term, count(*) AS n_tf
    FROM toks_ne WHERE term IN ({seed_list})
    GROUP BY doc_id, term
),
df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
s1 AS (
    SELECT tf1.doc_id, {score} AS score
    FROM tf1 JOIN lens USING (doc_id) JOIN df1 USING (term)
    CROSS JOIN stats GROUP BY tf1.doc_id
),
fb AS (
    SELECT doc_id, 1 AS in_seed_topk FROM s1
    ORDER BY score DESC, doc_id ASC LIMIT {PRF_FEEDBACK_K}
),
doc_terms AS (SELECT DISTINCT doc_id, term FROM toks_ne),
cdf AS (SELECT term, count(*) AS df FROM doc_terms GROUP BY term),
fterm AS (
    SELECT term, count(*) AS f
    FROM doc_terms JOIN fb USING (doc_id) GROUP BY term
),
expansion AS (
    SELECT ft.term
    FROM fterm ft JOIN cdf USING (term) CROSS JOIN stats
    WHERE ft.term NOT IN ({seed_list}) AND 2 * cdf.df <= stats.n_docs
    ORDER BY ft.f DESC, cdf.df ASC, ft.term ASC
    LIMIT {PRF_EXPAND}
),
qterms AS (
    SELECT term FROM expansion
    UNION ALL
    SELECT unnest([{seed_list}]) AS term
),
tf2 AS (
    SELECT t.doc_id, t.term, count(*) AS n_tf
    FROM toks_ne t JOIN qterms q ON t.term = q.term
    GROUP BY t.doc_id, t.term
),
df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
s2 AS (
    SELECT tf2.doc_id, count(*) AS n_terms_matched, {score} AS score
    FROM tf2 JOIN lens USING (doc_id) JOIN df2 USING (term)
    CROSS JOIN stats GROUP BY tf2.doc_id
),
top AS (
    SELECT doc_id, n_terms_matched, score FROM s2
    ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOPK}
)
SELECT CAST(row_number() OVER (ORDER BY t.score DESC, t.doc_id ASC)
            AS INT) AS rank,
       t.doc_id, t.score,
       CAST(t.n_terms_matched AS BIGINT) AS n_terms_matched,
       CAST(CASE WHEN fb.in_seed_topk IS NULL THEN 1 ELSE 0 END AS INT)
           AS newly_retrieved
FROM top t LEFT JOIN fb ON t.doc_id = fb.doc_id
"""


QUERIES["prf_query_expansion"] = (_prf_query_expansion, _prf_sql())


# --------------------------------------------------------------------------
# posting_gap_stats: index compression audit (delta + Elias-gamma cost)
# --------------------------------------------------------------------------
def _posting_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage engineering for the retrieval stack: per term, the
    doc-id DELTA distribution of its posting list and the exact
    Elias-gamma bit cost (2*floor(log2 gap)+1 per gap — floor(log2)
    computed EXACTLY as length(bin(gap))-1, an integer both engines
    derive from the same binary string, no float log) versus the flat
    64-bit encoding — the audit behind "frequent terms compress
    brilliantly because their gaps are tiny", i.e. why posting lists
    delta-encode. Output per term (df >= 2): (term, df, max_gap,
    gamma_bits, flat_bits, ratio_e6).

    Scale: postings come from the scan-fused explode + distinct; the
    delta is a per-term window lag (one keyed shuffle); bit costs are
    exact scalar integer expressions on the posting rows, aggregated
    map-side. Long-tail terms dominate rows, not cost.
    """
    from pyspark.sql import Window

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                     .alias("w")))
    post = (docs.select("doc_id", F.explode("w").alias("term"))
            .where(F.col("term") != "").distinct())
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = (post.withColumn("prev", F.lag("doc_id").over(w))
            .where(F.col("prev").isNotNull())
            .select("term",
                    (F.col("doc_id") - F.col("prev")).alias("g")))
    bits = F.expr("2 * (length(bin(g)) - 1) + 1")
    agg = (gaps.groupBy("term")
           .agg((F.count(F.lit(1)) + 1).alias("df"),
                F.max("g").alias("max_gap"),
                F.sum(bits).alias("gamma_gap_bits")))
    return agg.select(
        "term", "df", "max_gap",
        # first posting stored flat (64 bits), gaps gamma-coded
        (F.col("gamma_gap_bits") + 64).alias("gamma_bits"),
        (F.col("df") * 64).alias("flat_bits"),
        F.expr("1000000 * (gamma_gap_bits + 64) div (df * 64)")
         .alias("ratio_e6"))


_POSTING_GAP_SQL = r"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
post AS (
    SELECT DISTINCT doc_id, term
    FROM (SELECT doc_id, unnest(w) AS term FROM docs)
    WHERE term <> ''
),
gaps AS (
    SELECT term, doc_id - prev AS g
    FROM (SELECT term, doc_id,
                 lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
                     AS prev
          FROM post)
    WHERE prev IS NOT NULL
),
agg AS (
    SELECT term, CAST(count(*) + 1 AS BIGINT) AS df,
           CAST(max(g) AS BIGINT) AS max_gap,
           CAST(sum(2 * (length(bin(g)) - 1) + 1) AS BIGINT)
               AS gamma_gap_bits
    FROM gaps GROUP BY term
)
SELECT term, df, max_gap,
       gamma_gap_bits + 64 AS gamma_bits,
       df * 64 AS flat_bits,
       1000000 * (gamma_gap_bits + 64) // (df * 64) AS ratio_e6
FROM agg
"""

QUERIES["posting_gap_stats"] = (_posting_gap_stats, _POSTING_GAP_SQL)


# --------------------------------------------------------------------------
# pipe_syntax_report: Spark 4 SQL pipe (|>) surface parity
# --------------------------------------------------------------------------

def _pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax driving a real multi-stage report:
    filter |> aggregate |> post-filter |> order+limit, entirely in the
    |> surface — proof the engine's SQL layer accepts the pipeline
    dialect users migrate to (each |> stage compiles to the same
    Catalyst operators as the nested-SELECT oracle, so this is a
    zero-cost surface, not a second engine).

    Determinism: exact integer aggregates; the final ORDER BY ties
    break on (l_returnflag, l_linestatus).

    Scale: identical plan to the plain-SQL shape — one hash shuffle
    on the 6-cell group key, TakeOrdered for the limit (no range
    exchange).
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_li")
    return spark.sql("""
        FROM pipe_li
        |> WHERE l_quantity >= 5
        |> AGGREGATE count(*) AS n_items,
                     sum(cast(l_quantity AS bigint)) AS total_qty
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 10
        |> SELECT l_returnflag, l_linestatus, n_items, total_qty,
                  total_qty div n_items AS mean_qty_floor
        |> ORDER BY total_qty DESC, l_returnflag, l_linestatus
        |> LIMIT 5
    """)


_PIPE_SQL = """
SELECT l_returnflag, l_linestatus, n_items, total_qty,
       total_qty // n_items AS mean_qty_floor
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem WHERE l_quantity >= 5
  GROUP BY 1, 2
)
WHERE n_items > 10
ORDER BY total_qty DESC, l_returnflag, l_linestatus
LIMIT 5
"""


QUERIES["pipe_syntax_report"] = (_pipe_syntax_report, _PIPE_SQL)
