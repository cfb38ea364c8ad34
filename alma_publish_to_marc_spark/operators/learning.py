"""Distributed classifier TRAINING in pure DataFrame ops — the train
half of the quality-filter story (`plans/corpus_queries.py::
quality_classifier_score` serves a frozen logistic model; this induces
one from the corpus).

Full-batch gradient descent on logistic loss, K unrolled rounds, in
**quantized integer space** (the `operators/clustering.py` recipe):

- features are exact micro-unit integers (×1e6), labels ∈ {0, 1e6};
- the margin z is one int64 dot product (≤4e12, no overflow) divided
  once by 1e12 — a single correctly-rounded IEEE division;
- the sigmoid is the ONLY transcendental; its output is immediately
  quantized to micro units, so a ≤1-ulp exp() difference between
  engines can only surface if a value lands within 1 ulp of a .5 micro
  boundary (measure-zero; every other step is exact integer math);
- gradients are exact integer sums (map-side combinable), and the
  weight update rounds once back to micro units.

Scale: each round is ONE corpus scan into a 1-row gradient aggregate
(partial-aggregated, 4 numbers per partition) cross-joined back as a
broadcast — the weight state never lives on the driver and the corpus
never shuffles. K rounds = K scans, the same driver-paced shape as the
BPE trainer and connected components; at 100 TB you'd persist the
featurized projection once and stage rounds from it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

MICRO = 1_000_000
N_ROUNDS = 2
FEATURES = ("bias", "chars", "tokens", "mwl")


def _featurized(docs: DataFrame) -> DataFrame:
    """Micro-unit integer features per doc.

    x_bias = 1; x_chars = n_chars/1000; x_tokens = n_tokens/100;
    x_mwl = mean word length / 10 — all ~[0, 1] so a unit learning rate
    is stable, all exact integers in micro units. Label: lang = 'en'.
    """
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    src = (F.col("source") if "source" in docs.columns
           else F.lit("all").alias("source"))  # synthetic test frames
    return docs.select(
        src,
        F.lit(MICRO).cast("long").alias("x_bias"),
        (F.col("n_chars") * 1000).cast("long").alias("x_chars"),
        (n_tokens * 10000).cast("long").alias("x_tokens"),
        F.round(F.lit(100000) * F.col("n_chars") / n_tokens, 0)
         .cast("long").alias("x_mwl"),
        F.when(F.col("lang") == "en", F.lit(MICRO).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("y"))


def _z(w_prefix: str = "w_") -> Column:
    """Margin: fixed-order int64 dot product, one division to double."""
    total = F.lit(0).cast("long")
    for name in FEATURES:
        total = total + F.col(f"{w_prefix}{name}") * F.col(f"x_{name}")
    return total / F.lit(float(MICRO) * MICRO)


def _p_micro() -> Column:
    """Quantized sigmoid of the margin, in micro units."""
    return F.round(F.lit(MICRO) / (F.lit(1.0) + F.exp(-_z())), 0) \
        .cast("long")


def logreg_train(docs: DataFrame, n_rounds: int = N_ROUNDS,
                 feats: DataFrame | None = None) -> DataFrame:
    """Train the quality/language classifier; returns ONE row:
    (n_examples, w_bias, w_chars, w_tokens, w_mwl — micro ints —
    train_accuracy). Pass a PERSISTED ``feats`` when the caller also
    scores with the trained weights: the unrolled round plan
    references the featurized frame once per round per branch, so an
    unpersisted frame costs ~2^rounds corpus scans at evaluation."""
    if feats is None:
        feats = _featurized(docs)
    w = docs.sparkSession.range(1).select(*[
        F.lit(0).cast("long").alias(f"w_{n}") for n in FEATURES])
    for _ in range(n_rounds):
        p = _p_micro()
        grads = (feats.crossJoin(F.broadcast(w))
                 .select((p - F.col("y")).alias("err"),
                         *[F.col(f"x_{n}") for n in FEATURES])
                 .groupBy()
                 .agg(F.count(F.lit(1)).alias("n"),
                      *[F.sum(F.col("err") * F.col(f"x_{n}"))
                        .alias(f"g_{n}") for n in FEATURES]))
        w = w.crossJoin(F.broadcast(grads)).select(*[
            (F.col(f"w_{n}")
             - F.round(F.col(f"g_{n}") / (F.col("n") * MICRO), 0)
                .cast("long")).alias(f"w_{n}")
            for n in FEATURES])
    acc = (feats.crossJoin(F.broadcast(w))
           .agg(F.count(F.lit(1)).alias("n_examples"),
                F.round(F.avg(
                    F.when((_z() > 0) == (F.col("y") == MICRO), 1.0)
                     .otherwise(0.0)), 4).alias("train_accuracy")))
    return (w.crossJoin(F.broadcast(acc))
            .select("n_examples", *[F.col(f"w_{n}") for n in FEATURES],
                    "train_accuracy"))


def _logreg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logreg_train(load(spark, sf_dir, "documents"))


def _trained_feats_w(spark: SparkSession, sf_dir: str):
    """(feats, w) for every query that trains AND scores: the
    featurized frame is persisted (tracked, released via
    unpersist_cached()) because the unrolled training rounds plus the
    scoring/threshold branches each re-reference it — unpersisted,
    that is up to ~24 corpus scans in one plan (measured on the
    fairness audit before this helper existed)."""
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    feats = _featurized(docs).persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(feats)
    w = logreg_train(docs, feats=feats).select(
        *[f"w_{n}" for n in FEATURES])
    return feats, w


def _feat_sql() -> str:
    return r"""feats AS (
    SELECT source,
           CAST({m} AS BIGINT) AS x_bias,
           CAST(n_chars * 1000 AS BIGINT) AS x_chars,
           CAST(nt * 10000 AS BIGINT) AS x_tokens,
           CAST(round(100000 * n_chars / nt, 0) AS BIGINT) AS x_mwl,
           CAST(CASE WHEN lang = 'en' THEN {m} ELSE 0 END AS BIGINT) AS y
    FROM (SELECT source, n_chars, lang,
                 len(regexp_split_to_array(trim(text), '\s+')) AS nt
          FROM documents)
)""".format(m=MICRO)


def _z_sql(w_cte: str) -> str:
    dot = " + ".join(f"{w_cte}.w_{n} * feats.x_{n}" for n in FEATURES)
    return f"(({dot}) / {float(MICRO) * MICRO})"


def _w_chain_ctes(n_rounds: int = N_ROUNDS) -> list[str]:
    """The unrolled gradient-descent CTE chain feats, w0, g0, …
    w{n_rounds} — shared by the train oracle and the calibration
    oracle so the weight arithmetic can never diverge between them."""
    ctes = [_feat_sql(),
            "w0 AS (SELECT "
            + ", ".join(f"CAST(0 AS BIGINT) AS w_{n}" for n in FEATURES)
            + ")"]
    for i in range(n_rounds):
        z = _z_sql(f"w{i}")
        gsel = ", ".join(
            f"CAST(sum((CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
            f" - feats.y) * feats.x_{n}) AS BIGINT) AS g_{n}"
            for n in FEATURES)
        ctes.append(f"""g{i} AS (
    SELECT count(*) AS n, {gsel}
    FROM feats CROSS JOIN w{i}
)""")
        wsel = ", ".join(
            f"w{i}.w_{n} - CAST(round(g{i}.g_{n} / (g{i}.n * {MICRO}), 0)"
            f" AS BIGINT) AS w_{n}" for n in FEATURES)
        ctes.append(f"w{i + 1} AS (SELECT {wsel} FROM w{i} CROSS JOIN g{i})")
    return ctes


def _logreg_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    zf = _z_sql(f"w{n_rounds}")
    wcols = ", ".join(f"w{n_rounds}.w_{n}" for n in FEATURES)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT acc.n_examples, {wcols}, acc.train_accuracy
FROM w{n_rounds} CROSS JOIN (
    SELECT count(*) AS n_examples,
           round(avg(CASE WHEN ({zf} > 0) = (feats.y = {MICRO})
                          THEN 1.0 ELSE 0.0 END), 4) AS train_accuracy
    FROM feats CROSS JOIN w{n_rounds}
) acc
""")


QUERIES = {
    "logreg_train_fixed_point": (_logreg_query, _logreg_sql()),
}


# --------------------------------------------------------------------------
# Multinomial naive Bayes language classifier (train/test split, confusion)
# --------------------------------------------------------------------------
def naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes over unigram counts: train on the 80%
    hash split (doc_id % 5 != 0), classify the held-out 20%, emit the
    language confusion matrix — the trained-counterpart of the
    marker-list heuristic in ``doc_lang_id``/``lang_id_confusion``.
    Measured held-out accuracy at sf0.01 is 0.42 vs 0.20 chance — the
    driver corpus shares a ~31-token vocabulary across languages, so
    unigram counts are genuinely weakly separable (bigram features
    measure WORSE, 0.30, from sparsity); the value here is the
    train/serve shape, asserted end-to-end.

    Determinism: the only transcendental is ln of an exact integer
    rational ((c_wc+1)/(n_c+V), d_c/D), immediately quantized to
    micro-units (the ``logreg_train_fixed_point`` recipe) — per-doc
    scores are then exact int64 SUMS, associative in any engine, and
    the argmax ties break via struct-min on (−score, class).

    Scale: the model is (vocab × 5 classes) count rows built by one
    map-side-combinable aggregation over the train scan; scoring joins
    test-token occurrences to weights keyed on the word — vocabulary-
    sized, so the join stays keyed (sort-merge at 100 TB), while class
    totals / priors / V are 1-to-5-row broadcasts. The 5× class
    fan-out rides the token row, never the document text.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    tok = lambda df: (df.select(  # noqa: E731
        "doc_id", "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
        .where(F.col("w") != ""))
    ttok = tok(train).withColumn("wk", F.unhex(F.md5("w")))
    # token-keyed shuffles ride the 16-byte md5 key (CLAUDE.md rule)
    cwc = ttok.groupBy("lang", "wk").agg(F.count(F.lit(1)).alias("c_wc"))
    ctot = (ttok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
            .withColumnRenamed("lang", "cls"))
    vocab = ttok.agg(F.countDistinct("wk").alias("v"))
    priors = (train.groupBy("lang").agg(F.count(F.lit(1)).alias("d_c"))
              .withColumnRenamed("lang", "cls"))
    dtot = train.agg(F.count(F.lit(1)).alias("d_tot"))
    testtok = tok(test).select("doc_id", F.col("lang").alias("true_lang"),
                               F.unhex(F.md5("w")).alias("wk"))
    sc = (testtok
          .crossJoin(F.broadcast(ctot))
          .join(cwc.select(F.col("lang").alias("cls"), "wk", "c_wc"),
                ["cls", "wk"], "left")
          .crossJoin(F.broadcast(vocab)))
    w_int = F.coalesce(
        F.round(F.log((F.col("c_wc") + 1) / (F.col("n_c") + F.col("v")))
                * MICRO, 0).cast("long"),
        F.round(F.log(F.lit(1.0) / (F.col("n_c") + F.col("v")))
                * MICRO, 0).cast("long"))
    per_class = (sc.groupBy("doc_id", "true_lang", "cls")
                 .agg(F.sum(w_int).alias("ll")))
    prior_int = F.round(F.log(F.col("d_c") / F.col("d_tot")) * MICRO, 0) \
                 .cast("long")
    scored = (per_class
              .join(F.broadcast(priors.crossJoin(dtot)
                                .select("cls", prior_int.alias("p"))), "cls")
              .select("doc_id", "true_lang", "cls",
                      (F.col("ll") + F.col("p")).alias("score")))
    best = (scored.groupBy("doc_id", "true_lang")
            .agg(F.min(F.struct((-F.col("score")).alias("neg"),
                                F.col("cls").alias("cls"))).alias("b"))
            .select("doc_id", "true_lang", F.col("b.cls").alias("pred_lang")))
    # no final orderBy: the driver row-sorts before hashing, and a
    # cosmetic sort would add a rangepartitioning exchange to the plan
    return (best.groupBy("true_lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


_NB_SQL = rf"""
WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
test AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
ttok AS (
    SELECT doc_id, lang, w
    FROM (SELECT doc_id, lang,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM train)
    WHERE w <> ''
),
cwc AS (SELECT lang AS cls, unhex(md5(w)) AS wk, count(*) AS c_wc
       FROM ttok GROUP BY 1, 2),
ctot AS (SELECT lang AS cls, count(*) AS n_c FROM ttok GROUP BY 1),
vocab AS (SELECT count(DISTINCT unhex(md5(w))) AS v FROM ttok),
priors AS (SELECT lang AS cls, count(*) AS d_c FROM train GROUP BY 1),
dtot AS (SELECT count(*) AS d_tot FROM train),
testtok AS (
    SELECT doc_id, true_lang, unhex(md5(w)) AS wk
    FROM (SELECT doc_id, lang AS true_lang,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM test)
    WHERE w <> ''
),
per_class AS (
    SELECT tt.doc_id, tt.true_lang, ct.cls,
           sum(coalesce(
               CAST(round(ln((cwc.c_wc + 1) / (ct.n_c + v)) * {MICRO}, 0)
                    AS BIGINT),
               CAST(round(ln(1.0 / (ct.n_c + v)) * {MICRO}, 0) AS BIGINT)))
               AS ll
    FROM testtok tt
    CROSS JOIN ctot ct
    LEFT JOIN cwc ON cwc.cls = ct.cls AND cwc.wk = tt.wk
    CROSS JOIN vocab
    GROUP BY 1, 2, 3
),
scored AS (
    SELECT per_class.doc_id, per_class.true_lang, per_class.cls,
           ll + CAST(round(ln(priors.d_c / d_tot) * {MICRO}, 0) AS BIGINT)
               AS score
    FROM per_class JOIN priors ON priors.cls = per_class.cls CROSS JOIN dtot
),
best AS (
    SELECT doc_id, true_lang,
           min(struct_pack(neg := -score, cls := cls)).cls AS pred_lang
    FROM scored GROUP BY doc_id, true_lang
)
SELECT true_lang, pred_lang, count(*) AS n_docs
FROM best GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""

QUERIES["naive_bayes_confusion"] = (naive_bayes_confusion, _NB_SQL)


# ---------------------------------------------------------------------------
# Distributed decision-stump split search (the GBDT/random-forest kernel)
# ---------------------------------------------------------------------------
_STUMP_DIMS = 8       # search the first 8 embedding dimensions
_STUMP_CUTS = 7       # candidate thresholds per dimension (linspace)
_STUMP_TOPK = 5


def _decision_stump_split_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed best-split search — the inner loop of every
    distributed tree learner (GBDT/random forest): for each candidate
    (dimension, threshold), accumulate per-class left/right counts in
    ONE conditional aggregation pass, score splits by weighted Gini
    purity, and return the top candidates.

    Purity algebra stays exact: maximizing Σ_L c²/n_L + Σ_R c²/n_R is
    equivalent to minimizing weighted Gini, and the two fractions
    combine into ONE rational (ΣL·n_R + ΣR·n_L)/(n_L·n_R) — int64
    numerator/denominator from exact counts, divided once into a
    double both engines compute identically. Feature values quantize
    to e3 ints; thresholds are integer linspace cuts from per-dim
    min/max (derived, not constants). Ties break on (dim, thr) in the
    TakeOrdered.

    Scale: the candidate grid (dims × cuts) broadcasts; the counting
    pass is rows × dims × cuts conditional tallies that combine
    map-side — at 100 TB this is the same one-pass histogram trick
    XGBoost's approx mode uses (quantile-sketch candidates instead of
    linspace, same join shape)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform(F.slice("embedding", 1, _STUMP_DIMS),
                    lambda x: F.round(x * 1000).cast("long")).alias("q"))
    rows = emb.select(
        "label", F.posexplode("q").alias("dim", "val"))
    stats = rows.groupBy("dim").agg(F.min("val").alias("lo"),
                                    F.max("val").alias("hi"))
    cuts = (stats.select(
        "dim", F.explode(F.array(*[F.lit(t) for t in
                                   range(1, _STUMP_CUTS + 1)])).alias("t"),
        "lo", "hi")
        .select("dim", F.floor(F.col("lo") + (F.col("hi") - F.col("lo"))
                               * F.col("t") / (_STUMP_CUTS + 1))
                .cast("long").alias("thr")))
    tallies = (rows.join(F.broadcast(cuts), "dim")
               .groupBy("dim", "thr", "label")
               .agg(F.sum(F.when(F.col("val") <= F.col("thr"), 1)
                          .otherwise(0)).alias("cl"),
                    F.count(F.lit(1)).alias("ctot")))
    per_split = (tallies.groupBy("dim", "thr")
                 .agg(F.sum("cl").alias("n_l"),
                      F.sum(F.col("ctot") - F.col("cl")).alias("n_r"),
                      F.sum(F.col("cl") * F.col("cl")).alias("sl2"),
                      F.sum((F.col("ctot") - F.col("cl"))
                            * (F.col("ctot") - F.col("cl"))).alias("sr2")))
    score = ((F.col("sl2") * F.col("n_r") + F.col("sr2") * F.col("n_l"))
             .cast("double")
             / (F.col("n_l") * F.col("n_r")).cast("double"))
    return (per_split
            .where((F.col("n_l") > 0) & (F.col("n_r") > 0))
            .select("dim", "thr", "n_l", "n_r",
                    F.round(score, 6).alias("purity"))
            .orderBy(F.desc("purity"), F.asc("dim"), F.asc("thr"))
            .limit(_STUMP_TOPK))


def _stump_sql() -> str:
    return f"""
WITH rows_q AS (
  SELECT label, u.dim, u.val
  FROM (
    SELECT label,
           unnest(list_transform(range(1, {_STUMP_DIMS} + 1),
               i -> struct_pack(dim := i - 1,
                                val := CAST(round(embedding[i] * 1000)
                                            AS BIGINT)))) AS u
    FROM embeddings
  )
), stats AS (
  SELECT dim, min(val) AS lo, max(val) AS hi FROM rows_q GROUP BY 1
), cuts AS (
  SELECT dim, CAST(floor(lo + (hi - lo) * t / {_STUMP_CUTS + 1}) AS BIGINT) AS thr
  FROM stats, unnest(range(1, {_STUMP_CUTS} + 1)) AS r(t)
), tallies AS (
  SELECT r.dim, c.thr, r.label,
         CAST(sum(CASE WHEN r.val <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
             AS cl,
         CAST(count(*) AS BIGINT) AS ctot
  FROM rows_q r JOIN cuts c ON r.dim = c.dim
  GROUP BY 1, 2, 3
), per_split AS (
  SELECT dim, thr,
         CAST(sum(cl) AS BIGINT) AS n_l,
         CAST(sum(ctot - cl) AS BIGINT) AS n_r,
         CAST(sum(cl * cl) AS BIGINT) AS sl2,
         CAST(sum((ctot - cl) * (ctot - cl)) AS BIGINT) AS sr2
  FROM tallies GROUP BY 1, 2
)
SELECT CAST(dim AS INT) AS dim, thr, n_l, n_r,
       round((sl2 * n_r + sr2 * n_l) / CAST(n_l * n_r AS DOUBLE), 6)
           AS purity
FROM per_split
WHERE n_l > 0 AND n_r > 0
ORDER BY purity DESC, dim ASC, thr ASC
LIMIT {_STUMP_TOPK}
"""


QUERIES["decision_stump_split_search"] = (_decision_stump_split_search,
                                          _stump_sql())


# ---------------------------------------------------------------------------
# Exact AUC via Mann–Whitney rank sums (midrank tie handling, int64)
# ---------------------------------------------------------------------------


def _auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of an integer scorer (document length predicting
    lang = 'en') via the Mann–Whitney identity AUC = (R₁ − n₁(n₁+1)/2)
    / (n₁·n₀) — no threshold sweep, no trapezoids. Ties get midranks;
    doubling every rank keeps the whole computation in int64
    (2·midrank = 2·lo + (cnt − 1) from dense run boundaries), so both
    engines produce the IDENTICAL e6-floored AUC. This is the
    distributed AUC shape for billions of scored rows: one sort-free
    rank assignment from score-run aggregates, two global sums.

    Scale: ranks come from per-score-value runs (groupBy score — no
    global row_number), each run contributing its midrank × positives
    analytically; final reduce is a single row."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"))
    runs = docs.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    from pyspark.sql import Window
    w = (Window.orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    with_lo = runs.select(
        "score", "cnt", "pos",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("lo"))
    # midrank·2 = 2·lo + cnt − 1 ; positives in the run contribute
    # pos · midrank to R1 → 2·R1 sums pos·(2·lo + cnt − 1)
    sums = with_lo.agg(
        F.sum(F.col("pos") * (2 * F.col("lo") + F.col("cnt") - 1))
         .alias("r1x2"),
        F.sum("pos").alias("n1"), F.sum(F.col("cnt") - F.col("pos"))
         .alias("n0"))
    # int64 headroom: U2 = r1x2 − n1(n1+1) = 2U ≤ 2·n1·n0, so scaling
    # U2 by 1e6 in int64 would overflow once n1·n0 > ~4.6e12 (~4M rows
    # balanced) — and Spark wraps silently while DuckDB raises. Do the
    # scale-and-divide in DOUBLE in BOTH engines: int→double conversion
    # and IEEE mul/div are correctly rounded, so the e6 floor is still
    # bit-identical; int64 now only has to hold U2 and 2·n1·n0
    # themselves (good to ~n1·n0 < 4.6e18 ≈ 2e9 rows per class).
    auc_e6 = F.floor(
        F.lit(1_000_000.0)
        * (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
        / (2 * F.col("n1") * F.col("n0")).cast("double")).cast("long")
    return sums.select("n1", "n0", auc_e6.alias("auc_e6"))


_AUC_SQL = """
WITH docs AS (
  SELECT CAST(n_chars AS BIGINT) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), runs AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM docs GROUP BY 1
), with_lo AS (
  SELECT score, cnt, pos,
         COALESCE(CAST(sum(cnt) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) + 1 AS lo
  FROM runs
), sums AS (
  SELECT CAST(sum(pos * (2 * lo + cnt - 1)) AS BIGINT) AS r1x2,
         CAST(sum(pos) AS BIGINT) AS n1,
         CAST(sum(cnt - pos) AS BIGINT) AS n0
  FROM with_lo
)
SELECT n1, n0,
       CAST(floor(1000000.0 * CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
                  / CAST(2 * n1 * n0 AS DOUBLE)) AS BIGINT) AS auc_e6
FROM sums
"""

QUERIES["auc_mann_whitney"] = (_auc_mann_whitney, _AUC_SQL)


# ---------------------------------------------------------------------------
# k-NN classifier evaluation (leave-one-out over a fixed probe panel)
# ---------------------------------------------------------------------------
KNN_EVAL_K = 5
KNN_PROBE_MOD, KNN_PROBE_REM = 25, 7   # 4% deterministic eval panel


def _knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label prediction over the embedding corpus:
    every panel vector (vec_id % 25 == 7) is classified by majority
    vote of its 5 nearest non-self neighbors, and the output is the
    confusion matrix (true_label, pred_label, n_probes) — the eval
    that tells a curation pipeline whether embedding geometry actually
    separates its document classes before anyone trusts
    semantic-dedup cells or classifier-filtered mixtures built on it.

    Determinism: distances are exact integer squared-L2 in the
    clustering module's quantized space; neighbor ties break to the
    lowest vec_id, vote ties to the lowest label (struct-min on
    (-count, label) — min_by tie-break is undefined, struct-min isn't).

    Scale: the panel is a fixed-fraction eval sample, broadcast against
    the corpus scan exactly like ``brute_force_topk``'s probe set —
    O(panel × corpus) compares with NO corpus shuffle; the only
    shuffles are the (qid)-keyed WindowGroupLimit argmin (map-side
    limited) and two tiny panel-sized aggregations. A panel at 100 TB
    stays a few thousand vectors (eval, not inference); full-corpus
    inference would swap the brute pass for the IVF/SQ candidate
    generators in operators/similarity.py.
    """
    from .clustering import _quantized, _sq_dist

    emb = load(spark, sf_dir, "embeddings")
    vecs = _quantized(emb)
    labels = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    probes = (vecs.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
              .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    pairs = (vecs.join(F.broadcast(probes), F.col("vec_id") != F.col("qid"))
             .withColumn("d", _sq_dist(F.col("qv"), F.col("v"))))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy("d", "vec_id")
    knn = (pairs.withColumn("r", F.row_number().over(w))
           .where(F.col("r") <= KNN_EVAL_K)
           .select("qid", "vec_id"))
    votes = (knn.join(labels, "vec_id")
             .groupBy("qid", "label").agg(F.count(F.lit(1)).alias("cnt")))
    pred = votes.groupBy("qid").agg(
        F.min(F.struct((-F.col("cnt")).alias("negcnt"),
                       F.col("label").alias("lab")))
         .getField("lab").alias("pred_label"))
    truth = (labels.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
             .select(F.col("vec_id").alias("qid"),
                     F.col("label").alias("true_label")))
    return (truth.join(pred, "qid")
            .groupBy("true_label", "pred_label")
            .agg(F.count(F.lit(1)).alias("n_probes")))


_KNN_EVAL_SQL = f"""
WITH vecs AS (SELECT vec_id, {{qv}} AS v FROM embeddings),
probes AS (SELECT vec_id AS qid, v AS qv FROM vecs
           WHERE vec_id % {KNN_PROBE_MOD} = {KNN_PROBE_REM}),
pairs AS (
    SELECT p.qid, vecs.vec_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {{dim}} + 1),
                   i -> (p.qv[i] - vecs.v[i]) * (p.qv[i] - vecs.v[i]))),
               (x, y) -> x + y) AS d
    FROM vecs CROSS JOIN probes p
    WHERE vecs.vec_id <> p.qid
),
knn AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY d, vec_id) AS r
        FROM pairs
    ) WHERE r <= {KNN_EVAL_K}
),
votes AS (
    SELECT k.qid, CAST(e.label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS cnt
    FROM knn k JOIN embeddings e ON k.vec_id = e.vec_id
    GROUP BY 1, 2
),
pred AS (
    SELECT qid,
           (min(struct_pack(negcnt := -cnt, lab := label))).lab
               AS pred_label
    FROM votes GROUP BY qid
),
truth AS (
    SELECT vec_id AS qid, CAST(label AS BIGINT) AS true_label
    FROM embeddings WHERE vec_id % {KNN_PROBE_MOD} = {KNN_PROBE_REM}
)
SELECT t.true_label, p.pred_label, CAST(count(*) AS BIGINT) AS n_probes
FROM truth t JOIN pred p USING (qid)
GROUP BY 1, 2
"""


def _knn_eval_sql() -> str:
    from .clustering import _QV, DIM

    return _KNN_EVAL_SQL.format(qv=_QV, dim=DIM)


QUERIES["knn_classifier_eval"] = (_knn_classifier_eval, _knn_eval_sql())


# ---------------------------------------------------------------------------
# Closed-form multiple OLS via normal equations (3×3 Cramer solve)
# ---------------------------------------------------------------------------


def _ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression — n_chars regressed on
    (1, token count, 'the'-count) — solved exactly from one pass of
    sufficient statistics: the 9 Gram sums X'X / X'y / y'y are EXACT
    int64 aggregates (map-side combined), and the 3×3 Cramer solve +
    R² happen once on a single row. This is the distributed shape for
    closed-form regression at any scale: the corpus contributes only
    commutative integer sums; no iteration, no weight broadcast.

    Determinism: every sum is exact; each sum converts to double once
    (exact below 2^53) and the determinant / residual formulas are
    FIXED IEEE expression trees written with identical association in
    both engines — correctly-rounded ops over identical inputs give
    bit-identical doubles, so the e6 floors match exactly. (Past
    ~1e15 in a Gram sum the int→double conversion itself rounds;
    production at that scale would switch the sums to DECIMAL(38,0) —
    the aggregation shape is unchanged.)

    Scale: ONE corpus scan → ONE 1-row partial-aggregated reduce.
    Nothing else moves.
    """
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    feats = docs.select(
        F.col("n_chars").cast("long").alias("y"),
        F.size(words).cast("long").alias("x1"),
        F.size(F.filter(words, lambda w: w == "the")).cast("long")
         .alias("x2"))
    g = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"), F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    d = g.select(*[F.col(c).cast("double").alias(c) for c in
                   ("n", "sx1", "sx2", "sy", "s11", "s12", "s22",
                    "s1y", "s2y", "syy")])

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        # fixed association: a1*(b2*c3 - b3*c2) - a2*(b1*c3 - b3*c1)
        #                    + a3*(b1*c2 - b2*c1)
        return (a1 * (b2 * c3 - b3 * c2)
                - a2 * (b1 * c3 - b3 * c1)
                + a3 * (b1 * c2 - b2 * c1))

    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sy, s11, s12 = F.col("sy"), F.col("s11"), F.col("s12")
    s22, s1y, s2y = F.col("s22"), F.col("s1y"), F.col("s2y")
    solved = d.select(
        "*",
        det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22).alias("det"),
        det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22).alias("det0"),
        det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22).alias("det1"),
        det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y).alias("det2"))
    betas = solved.select(
        "*",
        (F.col("det0") / F.col("det")).alias("b0"),
        (F.col("det1") / F.col("det")).alias("b1"),
        (F.col("det2") / F.col("det")).alias("b2"))
    b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
    sse = F.col("syy") - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = F.col("syy") - sy * sy / n
    return betas.select(
        F.col("n").cast("long").alias("n_docs"),
        F.floor(F.lit(1_000_000.0) * b0).cast("long").alias("b0_e6"),
        F.floor(F.lit(1_000_000.0) * b1).cast("long").alias("b1_e6"),
        F.floor(F.lit(1_000_000.0) * b2).cast("long").alias("b2_e6"),
        F.floor(F.lit(1_000_000.0) * (F.lit(1.0) - sse / sst))
         .cast("long").alias("r2_e6"))


_OLS_SQL = r"""
WITH feats AS (
    SELECT CAST(n_chars AS BIGINT) AS y,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS x1,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                w -> w = 'the')) AS BIGINT) AS x2
    FROM documents
), g AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x1) AS BIGINT) AS sx1,
           CAST(sum(x2) AS BIGINT) AS sx2,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x1 * x1) AS BIGINT) AS s11,
           CAST(sum(x1 * x2) AS BIGINT) AS s12,
           CAST(sum(x2 * x2) AS BIGINT) AS s22,
           CAST(sum(x1 * y) AS BIGINT) AS s1y,
           CAST(sum(x2 * y) AS BIGINT) AS s2y,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM feats
), d AS (
    SELECT CAST(n AS DOUBLE) AS n, CAST(sx1 AS DOUBLE) AS sx1,
           CAST(sx2 AS DOUBLE) AS sx2, CAST(sy AS DOUBLE) AS sy,
           CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
           CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
           CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy
    FROM g
), dets AS (
    SELECT *,
           n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2) AS det,
           sy * (s11 * s22 - s12 * s12)
               - sx1 * (s1y * s22 - s12 * s2y)
               + sx2 * (s1y * s12 - s11 * s2y) AS det0,
           n * (s1y * s22 - s12 * s2y)
               - sy * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s2y - s1y * sx2) AS det1,
           n * (s11 * s2y - s1y * s12)
               - sx1 * (sx1 * s2y - s1y * sx2)
               + sy * (sx1 * s12 - s11 * sx2) AS det2
    FROM d
), betas AS (
    SELECT *, det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
    FROM dets
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(floor(1000000.0 * b0) AS BIGINT) AS b0_e6,
       CAST(floor(1000000.0 * b1) AS BIGINT) AS b1_e6,
       CAST(floor(1000000.0 * b2) AS BIGINT) AS b2_e6,
       CAST(floor(1000000.0 * (1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
                               / (syy - sy * sy / n))) AS BIGINT) AS r2_e6
FROM betas
"""

QUERIES["ols_normal_equations"] = (_ols_normal_equations, _OLS_SQL)


# ---------------------------------------------------------------------------
# Calibration reliability bins for the trained logistic classifier
# ---------------------------------------------------------------------------
CAL_BINS = 10


def _logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for ``logreg_train_fixed_point``: score every
    document with the trained weights, bucket the predicted probability
    into ``CAL_BINS`` equal-width bins over the OBSERVED score range
    (after 2 underfit rounds every p sits in [0.44, 0.47] — absolute
    deciles would collapse to one row, so the diagram bins the span the
    scores actually occupy, the standard move for clustered rankers),
    and emit per-bin (count, mean predicted probability, empirical
    positive rate, signed gap) — the audit that decides whether the
    filter's scores are usable as acceptance probabilities or only as
    a ranking.

    Determinism: predicted probabilities are the training loop's own
    quantized-micro sigmoid (exact int64 after quantization); bin ids
    are pure integer arithmetic ((pm−mn)·B div (mx−mn+1)), and all
    per-bin sums are exact; the two final divisions round identically.

    Scale: training is the K-scan driver-paced loop it already is;
    scoring + binning is one corpus scan for the 1-row min/max and one
    for the ≤``CAL_BINS``-row map-side-combined aggregate (fused at
    100 TB by staging the scored projection). Nothing new shuffles.
    """
    feats, w = _trained_feats_w(spark, sf_dir)
    scored = feats.crossJoin(F.broadcast(w)).select(
        _p_micro().alias("pm"), "y")
    rng = scored.agg(F.min("pm").alias("mn"), F.max("pm").alias("mx"))
    scored = scored.crossJoin(F.broadcast(rng))
    bin_id = F.expr(
        f"(pm - mn) * {CAL_BINS} div (mx - mn + 1)").cast("int")
    return (scored.groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum("pm") / F.count(F.lit(1)) / MICRO, 4)
                  .alias("mean_pred"),
                 F.round(F.sum(F.when(F.col("y") == MICRO, 1).otherwise(0))
                         / F.count(F.lit(1)), 4).alias("frac_pos"))
            .select("bin", "n_docs", "mean_pred", "frac_pos",
                    F.round(F.col("mean_pred") - F.col("frac_pos"), 4)
                     .alias("gap")))


def _calibration_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    z = _z_sql(f"w{n_rounds}")
    pm = f"CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
    return ("WITH " + ",\n".join(ctes) + f""",
scored AS (
    SELECT {pm} AS pm, feats.y AS y
    FROM feats CROSS JOIN w{n_rounds}
),
rng AS (SELECT min(pm) AS mn, max(pm) AS mx FROM scored),
bins AS (
    SELECT CAST((pm - mn) * {CAL_BINS} // (mx - mn + 1) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(pm) AS BIGINT) / count(*) / {MICRO}, 4)
               AS mean_pred,
           round(CAST(sum(CASE WHEN y = {MICRO} THEN 1 ELSE 0 END)
                      AS BIGINT) / count(*), 4) AS frac_pos
    FROM scored CROSS JOIN rng GROUP BY 1
)
SELECT bin, n_docs, mean_pred, frac_pos,
       round(mean_pred - frac_pos, 4) AS gap
FROM bins
""")


QUERIES["logreg_calibration_bins"] = (_logreg_calibration_bins,
                                      _calibration_sql())


# Persisted frames released via unpersist_cached() (the
# operators/clustering.py contract; first needed by isotonic below).
_PERSISTED: list[DataFrame] = []


def unpersist_cached() -> int:
    """Release frames persisted by this module's queries."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


def _isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) recalibration of the classifier's reliability
    bins — the standard fix when ``logreg_calibration_bins`` shows a
    non-monotone or biased diagram: replace each bin's raw positive
    rate with the best monotone fit. Computed EXACTLY via the minimax
    identity fit_i = max_{j<=i} min_{k>=i} pooled_rate(j..k) — the
    closed form of pool-adjacent-violators — which is pure joins +
    min/max, no sequential pooling loop. Output per bin: (bin,
    n_docs, pos, raw_e6, iso_e6).

    Determinism: pooled rates are one correctly-rounded division of
    exact int64 prefix sums, so both engines hold identical doubles;
    min/max/floor on identical doubles are identical. Monotonicity
    survives IEEE rounding: dropping k=i from the inner min can only
    raise it, so fit_{i+1} >= fit_i holds on the rounded values too.

    Scale: the corpus collapses to <=CAL_BINS rows in the same two
    scans as the reliability diagram; the minimax grid is <=B^3 rows
    of the persisted prefix frame (4 consumer branches — CLAUDE.md
    multi-branch hazard — released via unpersist_cached()). B is a
    constant; corpus size never touches the grid.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    feats, w = _trained_feats_w(spark, sf_dir)
    scored = feats.crossJoin(F.broadcast(w)).select(
        _p_micro().alias("pm"), "y")
    rng = scored.agg(F.min("pm").alias("mn"), F.max("pm").alias("mx"))
    scored = scored.crossJoin(F.broadcast(rng))
    bin_id = F.expr(
        f"(pm - mn) * {CAL_BINS} div (mx - mn + 1)").cast("int")
    bins = (scored.groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("y") == MICRO, 1).otherwise(0))
                  .alias("pos")))
    wspec = (Window.orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pref = (bins.select("bin", "n_docs", "pos",
                        F.sum("n_docs").over(wspec).alias("c"),
                        F.sum("pos").over(wspec).alias("p"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    _PERSISTED.append(pref)
    j = pref.select(F.col("bin").alias("j"),
                    (F.col("p") - F.col("pos")).alias("pj"),
                    (F.col("c") - F.col("n_docs")).alias("cj"))
    k = pref.select(F.col("bin").alias("k"), F.col("p").alias("pk"),
                    F.col("c").alias("ck"))
    jk = (j.crossJoin(k).where(F.col("j") <= F.col("k"))
          .select("j", "k",
                  ((F.col("pk") - F.col("pj")).cast("double")
                   / (F.col("ck") - F.col("cj")).cast("double"))
                  .alias("r")))
    i = pref.select(F.col("bin").alias("i"))
    inner = (i.join(F.broadcast(jk), (F.col("j") <= F.col("i"))
                    & (F.col("k") >= F.col("i")))
             .groupBy("i", "j").agg(F.min("r").alias("mr")))
    fit = inner.groupBy("i").agg(F.max("mr").alias("fit"))
    return (pref.join(F.broadcast(fit), pref["bin"] == fit["i"])
            .select("bin", "n_docs", "pos",
                    F.expr("1000000 * pos div n_docs").alias("raw_e6"),
                    F.expr("cast(floor(1000000.0 * fit) as bigint)")
                     .alias("iso_e6")))


def _isotonic_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    z = _z_sql(f"w{n_rounds}")
    pm = f"CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
    return ("WITH " + ",\n".join(ctes) + f""",
scored AS (
    SELECT {pm} AS pm, feats.y AS y
    FROM feats CROSS JOIN w{n_rounds}
),
rng AS (SELECT min(pm) AS mn, max(pm) AS mx FROM scored),
bins AS (
    SELECT CAST((pm - mn) * {CAL_BINS} // (mx - mn + 1) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN y = {MICRO} THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
    FROM scored CROSS JOIN rng GROUP BY 1
),
pref AS MATERIALIZED (
    SELECT bin, n_docs, pos,
           CAST(sum(n_docs) OVER (ORDER BY bin) AS BIGINT) AS c,
           CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS p
    FROM bins
),
jk AS (
    SELECT j.bin AS j, k.bin AS k,
           CAST(k.p - (j.p - j.pos) AS DOUBLE)
               / CAST(k.c - (j.c - j.n_docs) AS DOUBLE) AS r
    FROM pref j JOIN pref k ON j.bin <= k.bin
),
inner_ AS (
    SELECT i.bin AS i, jk.j, min(jk.r) AS mr
    FROM pref i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
    GROUP BY i.bin, jk.j
),
fit AS (SELECT i, max(mr) AS fit FROM inner_ GROUP BY i)
SELECT p.bin, p.n_docs, p.pos,
       1000000 * p.pos // p.n_docs AS raw_e6,
       CAST(floor(1000000.0 * f.fit) AS BIGINT) AS iso_e6
FROM pref p JOIN fit f ON p.bin = f.i
""")


QUERIES["isotonic_calibration"] = (_isotonic_calibration,
                                   _isotonic_sql())


def _brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the classifier's Brier score over the
    same reliability bins: BRIER (overall squared error), REL (how far
    bin-mean predictions sit from bin outcomes — miscalibration), RES
    (how much the bins separate outcomes — discrimination), UNC (base
    outcome variance). The one-row scorecard that says whether a bad
    Brier comes from miscalibration (fix with isotonic_calibration)
    or from no signal (fix the model). Output: (n_docs, brier_e6,
    rel_e6, res_e6, unc_e6).

    Determinism: the corpus-scale sums are exact int64 (squared micro
    gaps; headroom N < 9.2e6 docs per partition-sum — lift to DOUBLE
    terms past that); REL/RES are per-bin DOUBLE terms summed by an
    explicit left fold over the bin-sorted array (the CLAUDE.md float-
    reduction rule — engine-default SUM order is not portable), with
    IDENTICAL term expressions in both engines. BRIER/UNC are single
    divisions of exact ints. The decomposition identity holds only up
    to within-bin prediction variance, which binning discards — the
    invariant test bounds the residual rather than asserting equality.

    Scale: scoring + binning is the same two-scan shape as the
    reliability diagram; the folds run over <=CAL_BINS elements in one
    row. Nothing new shuffles.
    """
    feats, w = _trained_feats_w(spark, sf_dir)
    scored = feats.crossJoin(F.broadcast(w)).select(
        _p_micro().alias("pm"),
        F.when(F.col("y") == MICRO, 1).otherwise(0).cast("long")
         .alias("y01"))
    rng = scored.agg(F.min("pm").alias("mn"), F.max("pm").alias("mx"))
    scored = scored.crossJoin(F.broadcast(rng))
    bin_id = F.expr(
        f"(pm - mn) * {CAL_BINS} div (mx - mn + 1)").cast("int")
    sd = F.expr("(pm - 1000000 * y01) * (pm - 1000000 * y01)")
    bins = (scored.groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("pm").alias("a"),
                 F.sum("y01").alias("b"), F.sum(sd).alias("s")))
    one = bins.agg(
        F.array_sort(F.collect_list(F.struct("bin", "n", "a", "b")))
         .alias("arr"),
        F.sum("n").alias("nn"), F.sum("b").alias("bb"),
        F.sum("s").alias("ssq"))
    rel = ("aggregate(transform(arr, x ->"
           " ((cast(x.a as double) - 1000000.0 * x.b)"
           "  * (cast(x.a as double) - 1000000.0 * x.b))"
           " / (cast(x.n as double) * 1000000000000.0"
           "    * cast(nn as double))),"
           " cast(0.0 as double), (acc, x) -> acc + x)")
    res = ("aggregate(transform(arr, x ->"
           " ((cast(x.b as double) * cast(nn as double)"
           "   - cast(bb as double) * x.n)"
           "  * (cast(x.b as double) * cast(nn as double)"
           "     - cast(bb as double) * x.n))"
           " / (cast(x.n as double) * cast(nn as double)"
           "    * cast(nn as double) * cast(nn as double))),"
           " cast(0.0 as double), (acc, x) -> acc + x)")
    return one.select(
        F.col("nn").alias("n_docs"),
        F.expr("cast(floor(cast(ssq as double)"
               " / (cast(nn as double) * 1000000.0)) as bigint)")
         .alias("brier_e6"),
        F.expr(f"cast(floor(1000000.0 * ({rel})) as bigint)")
         .alias("rel_e6"),
        F.expr(f"cast(floor(1000000.0 * ({res})) as bigint)")
         .alias("res_e6"),
        F.expr("cast(floor(1000000.0"
               " * (cast(bb as double) * (nn - bb))"
               " / (cast(nn as double) * cast(nn as double)))"
               " as bigint)").alias("unc_e6"))


def _brier_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    z = _z_sql(f"w{n_rounds}")
    pm = f"CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
    rel = ("list_reduce(list_prepend(0.0, list_transform(arr, x ->"
           " ((CAST(x.a AS DOUBLE) - 1000000.0 * x.b)"
           "  * (CAST(x.a AS DOUBLE) - 1000000.0 * x.b))"
           " / (CAST(x.n AS DOUBLE) * 1000000000000.0"
           "    * CAST(nn AS DOUBLE)))),"
           " (acc, x) -> acc + x)")
    res = ("list_reduce(list_prepend(0.0, list_transform(arr, x ->"
           " ((CAST(x.b AS DOUBLE) * CAST(nn AS DOUBLE)"
           "   - CAST(bb AS DOUBLE) * x.n)"
           "  * (CAST(x.b AS DOUBLE) * CAST(nn AS DOUBLE)"
           "     - CAST(bb AS DOUBLE) * x.n))"
           " / (CAST(x.n AS DOUBLE) * CAST(nn AS DOUBLE)"
           "    * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))),"
           " (acc, x) -> acc + x)")
    return ("WITH " + ",\n".join(ctes) + f""",
scored AS (
    SELECT {pm} AS pm,
           CASE WHEN feats.y = {MICRO} THEN 1 ELSE 0 END AS y01
    FROM feats CROSS JOIN w{n_rounds}
),
rng AS (SELECT min(pm) AS mn, max(pm) AS mx FROM scored),
bins AS (
    SELECT CAST((pm - mn) * {CAL_BINS} // (mx - mn + 1) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pm) AS BIGINT) AS a,
           CAST(sum(y01) AS BIGINT) AS b,
           CAST(sum((pm - 1000000 * y01) * (pm - 1000000 * y01))
                AS BIGINT) AS s
    FROM scored CROSS JOIN rng GROUP BY 1
),
one AS (
    SELECT list_sort(list(struct_pack(bin := bin, n := n, a := a,
                                      b := b))) AS arr,
           CAST(sum(n) AS BIGINT) AS nn, CAST(sum(b) AS BIGINT) AS bb,
           CAST(sum(s) AS BIGINT) AS ssq
    FROM bins
)
SELECT nn AS n_docs,
       CAST(floor(CAST(ssq AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * 1000000.0)) AS BIGINT)
           AS brier_e6,
       CAST(floor(1000000.0 * ({rel})) AS BIGINT) AS rel_e6,
       CAST(floor(1000000.0 * ({res})) AS BIGINT) AS res_e6,
       CAST(floor(1000000.0 * (CAST(bb AS DOUBLE) * (nn - bb))
                  / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
           AS BIGINT) AS unc_e6
FROM one
""")


QUERIES["brier_decomposition"] = (_brier_decomposition, _brier_sql())


def _roc_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep of the classifier: confusion counts, TPR/FPR,
    precision, F1 and Youden's J at {CAL_BINS}+1 thresholds spaced on
    the observed score range — the table behind a ROC/PR plot and the
    operating-point choice. Thresholds are the SAME integer bucket
    edges as the reliability diagram, so the sweep is ONE bucket
    aggregate plus a reverse cumulative sum — not K corpus scans.
    Output per threshold: (k, thr, tp, fp, fn, tn, tpr_e6, fpr_e6,
    prec_e6, f1_e6, youden_e6).

    Determinism: bucket ids and threshold edges are pure integer
    arithmetic on exact micro scores; every rate is an integer e6
    division of nonneg counts (div==// on positives); precision at an
    empty prediction set is pinned to 0 in both engines. youden can go
    negative — integer subtraction, no float sign-zero hazard.

    Scale: scoring + one map-side-combinable bucket aggregate; the
    threshold table is {CAL_BINS}+1 rows built from integer window
    sums over <={CAL_BINS} buckets.
    """
    from pyspark.sql import Window

    feats, w = _trained_feats_w(spark, sf_dir)
    scored = feats.crossJoin(F.broadcast(w)).select(
        _p_micro().alias("pm"),
        F.when(F.col("y") == MICRO, 1).otherwise(0).cast("long")
         .alias("y01"))
    rng = scored.agg(F.min("pm").alias("mn"), F.max("pm").alias("mx"))
    scored = scored.crossJoin(F.broadcast(rng))
    bin_id = F.expr(
        f"(pm - mn) * {CAL_BINS} div (mx - mn + 1)").cast("long")
    bins = (scored.groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("y01").alias("p"),
                 F.max("mn").alias("mn"), F.max("mx").alias("mx")))
    tot = bins.agg(F.sum("n").alias("nn"), F.sum("p").alias("pp"),
                   F.max("mn").alias("mn"), F.max("mx").alias("mx"))
    # threshold k selects buckets >= k; k = CAL_BINS is the empty set
    # (densified to exact zeros so the reverse cumsum is well-defined
    # at every k even when a bucket has no rows)
    ks = spark.range(CAL_BINS + 1).select(F.col("id").alias("bin"))
    dense = (ks.join(F.broadcast(bins.select("bin", "n", "p")),
                     "bin", "left")
             .select("bin", F.coalesce("n", F.lit(0)).alias("n"),
                     F.coalesce("p", F.lit(0)).alias("p")))
    wrev = (Window.orderBy(F.desc("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dense.select(F.col("bin").alias("k"),
                       F.sum("n").over(wrev).alias("pred_pos"),
                       F.sum("p").over(wrev).alias("tp"))
    m = (cum.crossJoin(F.broadcast(tot))
         .withColumn("fp", F.col("pred_pos") - F.col("tp"))
         .withColumn("fn", F.col("pp") - F.col("tp"))
         .withColumn("tn", F.col("nn") - F.col("pp") - F.col("fp")))
    return m.select(
        "k",
        F.expr(f"mn + (k * (mx - mn + 1)) div {CAL_BINS}").alias("thr"),
        "tp", "fp", "fn", "tn",
        F.expr("1000000 * tp div pp").alias("tpr_e6"),
        F.expr("1000000 * fp div (nn - pp)").alias("fpr_e6"),
        F.expr("case when pred_pos = 0 then cast(0 as bigint)"
               " else 1000000 * tp div pred_pos end").alias("prec_e6"),
        F.expr("case when 2 * tp + fp + fn = 0 then cast(0 as bigint)"
               " else 1000000 * 2 * tp div (2 * tp + fp + fn) end")
         .alias("f1_e6"),
        F.expr("1000000 * tp div pp - 1000000 * fp div (nn - pp)")
         .alias("youden_e6"))


_ROC_SQL_TMPL = """,
bins AS (
    SELECT CAST((pm - mn) * {B} // (mx - mn + 1) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y01) AS BIGINT) AS p
    FROM scored CROSS JOIN rng GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(p) AS BIGINT) AS pp,
           (SELECT mn FROM rng) AS mn, (SELECT mx FROM rng) AS mx
    FROM bins
),
dense AS (
    SELECT ks.bin, coalesce(b.n, 0) AS n, coalesce(b.p, 0) AS p
    FROM range({B} + 1) ks(bin) LEFT JOIN bins b ON b.bin = ks.bin
),
cum AS (
    SELECT bin AS k,
           CAST(sum(n) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS pred_pos,
           CAST(sum(p) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS tp
    FROM dense
),
m AS (
    SELECT k, pred_pos, tp, pred_pos - tp AS fp, pp - tp AS fn,
           nn - pp - (pred_pos - tp) AS tn, nn, pp, mn, mx
    FROM cum CROSS JOIN tot
)
SELECT k, mn + (k * (mx - mn + 1)) // {B} AS thr,
       tp, fp, fn, tn,
       1000000 * tp // pp AS tpr_e6,
       1000000 * fp // (nn - pp) AS fpr_e6,
       CASE WHEN pred_pos = 0 THEN CAST(0 AS BIGINT)
            ELSE 1000000 * tp // pred_pos END AS prec_e6,
       CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
            ELSE 1000000 * 2 * tp // (2 * tp + fp + fn) END AS f1_e6,
       1000000 * tp // pp - 1000000 * fp // (nn - pp) AS youden_e6
FROM m
"""


def _roc_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    z = _z_sql(f"w{n_rounds}")
    pm = f"CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
    return ("WITH " + ",\n".join(ctes) + f""",
scored AS (
    SELECT {pm} AS pm,
           CASE WHEN feats.y = {MICRO} THEN 1 ELSE 0 END AS y01
    FROM feats CROSS JOIN w{n_rounds}
),
rng AS (SELECT min(pm) AS mn, max(pm) AS mx FROM scored)"""
            + _ROC_SQL_TMPL.format(B=CAL_BINS))


QUERIES["roc_curve_points"] = (_roc_curve_points, _roc_sql())


def _fairness_group_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the classifier at its median operating
    point: per source, the predicted-positive rate (demographic
    parity), TPR and FPR (equalized odds), and each group's signed
    gap from the pooled rate — the table a data-governance review
    reads before the filter ships. Output per source: (source,
    n_docs, pos_rate_e6, tpr_e6, fpr_e6, dp_gap_e6, eo_gap_e6).

    Determinism: the threshold is the exact lower median of the
    integer micro scores, found on a (score -> count) run table with
    an integer cumsum — never a global sort of the corpus; every rate
    is an integer e6 division and every gap an integer subtraction
    (negative-zero float hazard cannot arise). Zero-positive or
    zero-negative groups pin their undefined rate to 0 in both
    engines.

    Scale: two map-side-combinable corpus aggregates (the score run
    table and the per-group confusion counts) on top of the shared
    training chain; the per-group frame is persisted (it feeds the
    pooled totals AND the final projection) and released via
    unpersist_cached().
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    feats, w = _trained_feats_w(spark, sf_dir)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "source", _p_micro().alias("pm"),
        F.when(F.col("y") == MICRO, 1).otherwise(0).cast("long")
         .alias("y01"))
    runs = scored.groupBy("pm").agg(F.count(F.lit(1)).alias("c"))
    wcum = (Window.orderBy("pm")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cums = runs.select("pm", F.sum("c").over(wcum).alias("cum"))
    tot = runs.agg(F.sum("c").alias("nn"))
    med = (cums.crossJoin(F.broadcast(tot))
           .where(F.expr("cum >= (nn + 1) div 2"))
           .agg(F.min("pm").alias("med")))
    pred = (scored.crossJoin(F.broadcast(med))
            .select("source", "y01",
                    (F.col("pm") > F.col("med")).cast("long")
                    .alias("pr")))
    g = (pred.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("y01").alias("pos"),
              F.sum("pr").alias("predp"),
              F.sum(F.col("pr") * F.col("y01")).alias("tp"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    _PERSISTED.append(g)
    ov = g.agg(F.sum("n").alias("onn"), F.sum("pos").alias("opos"),
               F.sum("predp").alias("opredp"), F.sum("tp").alias("otp"))
    rate = "case when {d} = 0 then cast(0 as bigint)" \
           " else 1000000 * {n} div {d} end"
    return (g.crossJoin(F.broadcast(ov)).select(
        "source", F.col("n").alias("n_docs"),
        F.expr(rate.format(n="predp", d="n")).alias("pos_rate_e6"),
        F.expr(rate.format(n="tp", d="pos")).alias("tpr_e6"),
        F.expr(rate.format(n="(predp - tp)", d="(n - pos)"))
         .alias("fpr_e6"),
        (F.expr(rate.format(n="predp", d="n"))
         - F.expr(rate.format(n="opredp", d="onn"))).alias("dp_gap_e6"),
        (F.expr(rate.format(n="tp", d="pos"))
         - F.expr(rate.format(n="otp", d="opos"))).alias("eo_gap_e6")))


def _fairness_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = _w_chain_ctes(n_rounds)
    z = _z_sql(f"w{n_rounds}")
    pm = f"CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"

    def rate(n: str, d: str) -> str:
        return (f"CASE WHEN {d} = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE 1000000 * {n} // {d} END")

    return ("WITH " + ",\n".join(ctes) + f""",
scored AS (
    SELECT feats.source, {pm} AS pm,
           CASE WHEN feats.y = {MICRO} THEN 1 ELSE 0 END AS y01
    FROM feats CROSS JOIN w{n_rounds}
),
runs AS (SELECT pm, CAST(count(*) AS BIGINT) AS c FROM scored GROUP BY 1),
cums AS (
    SELECT pm, CAST(sum(c) OVER (ORDER BY pm
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum
    FROM runs
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM runs),
med AS (
    SELECT min(pm) AS med FROM cums CROSS JOIN tot
    WHERE cum >= (nn + 1) // 2
),
pred AS (
    SELECT source, y01,
           CASE WHEN pm > (SELECT med FROM med) THEN 1 ELSE 0 END AS pr
    FROM scored
),
g AS MATERIALIZED (
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y01) AS BIGINT) AS pos,
           CAST(sum(pr) AS BIGINT) AS predp,
           CAST(sum(pr * y01) AS BIGINT) AS tp
    FROM pred GROUP BY 1
),
ov AS (
    SELECT CAST(sum(n) AS BIGINT) AS onn, CAST(sum(pos) AS BIGINT)
               AS opos,
           CAST(sum(predp) AS BIGINT) AS opredp,
           CAST(sum(tp) AS BIGINT) AS otp
    FROM g
)
SELECT source, n AS n_docs,
       {rate('predp', 'n')} AS pos_rate_e6,
       {rate('tp', 'pos')} AS tpr_e6,
       {rate('(predp - tp)', '(n - pos)')} AS fpr_e6,
       {rate('predp', 'n')} - {rate('opredp', 'onn')} AS dp_gap_e6,
       {rate('tp', 'pos')} - {rate('otp', 'opos')} AS eo_gap_e6
FROM g CROSS JOIN ov
""")


QUERIES["fairness_group_audit"] = (_fairness_group_audit,
                                   _fairness_sql())


# ---------------------------------------------------------------------------
# Leave-one-out target encoding with additive smoothing
# ---------------------------------------------------------------------------
TE_ALPHA = 10   # pseudo-observations of the global mean


def _target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical (order priority)
    against a numeric target (order price in cents): each row's
    encoding is the mean target of its OWN group with the row itself
    excluded, shrunk toward the global mean by ``TE_ALPHA``
    pseudo-counts — enc_i = (S_g − y_i + α·S/N) / (n_g − 1 + α).
    LOO-plus-smoothing is the leakage-safe way to feed a high-
    cardinality categorical to a model: plain group means let the
    label leak into its own feature, which this construction excludes
    by definition.

    Determinism: S_g, n_g, S, N are exact int64; the encoding is
    cross-multiplied into one exact-integer numerator/denominator
    (num = (S_g−y_i)·N + α·S, den = (n_g−1+α)·N) before the single
    scaled division — both ints convert to double exactly (< 2^53 up
    to ~9e15-cent group sums; past that, pre-divide S/N once), so the
    e6 floor matches bit-for-bit.

    Scale: one group aggregation (|categories| rows, broadcast back)
    + one 1-row global aggregate — the encoding itself is scan-fused
    per row. No per-row shuffle at any scale.
    """
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", cents.alias("y"))
    grp = orders.groupBy("o_orderpriority").agg(
        F.sum("y").alias("s_g"), F.count(F.lit(1)).alias("n_g"))
    glob = orders.agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("n"))
    j = orders.join(F.broadcast(grp), "o_orderpriority") \
              .crossJoin(F.broadcast(glob))
    num = ((F.col("s_g") - F.col("y")) * F.col("n")
           + F.lit(TE_ALPHA) * F.col("s")).cast("double")
    den = ((F.col("n_g") - 1 + TE_ALPHA) * F.col("n")).cast("double")
    return j.select(
        "o_orderkey", "o_orderpriority",
        F.col("y").alias("price_cents"),
        F.floor(F.lit(1_000_000.0) * num / den).cast("long")
         .alias("enc_e6"))


_TE_SQL = f"""
WITH orders_c AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
    FROM orders
),
grp AS (
    SELECT o_orderpriority, CAST(sum(y) AS BIGINT) AS s_g,
           CAST(count(*) AS BIGINT) AS n_g
    FROM orders_c GROUP BY o_orderpriority
),
overall AS (SELECT CAST(sum(y) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders_c)
SELECT o.o_orderkey, o.o_orderpriority, o.y AS price_cents,
       CAST(floor(1000000.0
                  * CAST((g.s_g - o.y) * gl.n + {TE_ALPHA} * gl.s AS DOUBLE)
                  / CAST((g.n_g - 1 + {TE_ALPHA}) * gl.n AS DOUBLE))
            AS BIGINT) AS enc_e6
FROM orders_c o
JOIN grp g USING (o_orderpriority)
CROSS JOIN overall gl
"""

QUERIES["target_encoding_loo"] = (_target_encoding_loo, _TE_SQL)


# ---------------------------------------------------------------------------
# Retrieval ranking metrics: MRR@k / MAP@k / NDCG@k
# ---------------------------------------------------------------------------
RANK_K = 10
# lcm(1..10): makes every precision@i an exact integer numerator
_AP_LCM = 2520
# NDCG discount table floor(1e9 / log2(i+1)), i = 1..10, and its prefix
# sums (ideal DCG for R relevant docs). Computed ONCE here and injected
# into BOTH engines as literals, so the transcendental log2 never runs
# inside either engine — the cross-engine hazard class ADVICE flagged
# for ln() cannot arise (the constants are bytes in the plan).
_DISC_E9 = (1000000000, 630929753, 500000000, 430676558, 386852807,
            356207187, 333333333, 315464876, 301029995, 289064826)
_IDCG_E9 = (1000000000, 1630929753, 2130929753, 2561606311, 2948459118,
            3304666305, 3637999638, 3953464514, 4254494509, 4543559335)


def _ranking_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval of the embedding space: every panel
    vector (the ``knn_classifier_eval`` 4% panel) queries the corpus
    for its 10 nearest non-self neighbors; a hit is a neighbor sharing
    the probe's label. Reports per-label mean MRR@10, MAP@10 and
    NDCG@10 — the standard triple a retrieval/RAG deployment gates on
    before trusting an index (recall_eval answers "did ANN lose
    neighbors?", this answers "are the neighbors the RIGHT ones?").

    Determinism: ranks tie-break on vec_id; every metric is exact
    integer arithmetic — MRR as 1e6 div rank, AP on the lcm(1..10)
    denominator, DCG against the shared literal discount table — and
    per-label means are integer ``div`` by the probe count. No float
    leaves either engine.

    Scale: identical shape to ``knn_classifier_eval`` — broadcast
    panel × corpus scan, no corpus shuffle; per-probe metric folds are
    (qid)-keyed aggregations over ≤10 rows each. At 100 TB the brute
    pass swaps for the IVF/SQ candidate generators; the metric algebra
    is unchanged. int64 headroom: dcg ≤ 4.6e9, ×1e6 ≤ 4.6e15 ≪ 2^63.
    """
    from pyspark.sql import Window

    from .clustering import _quantized, _sq_dist

    emb = load(spark, sf_dir, "embeddings")
    vecs = _quantized(emb)
    labels = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    probes = (vecs.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
              .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    pairs = (vecs.join(F.broadcast(probes), F.col("vec_id") != F.col("qid"))
             .withColumn("d", _sq_dist(F.col("qv"), F.col("v"))))
    w = Window.partitionBy("qid").orderBy("d", "vec_id")
    top = (pairs.withColumn("r", F.row_number().over(w))
           .where(F.col("r") <= RANK_K)
           .select("qid", "vec_id", "r"))
    ptruth = (labels.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
              .select(F.col("vec_id").alias("qid"),
                      F.col("label").alias("qlabel")))
    hits = (top.join(labels, "vec_id").join(F.broadcast(ptruth), "qid")
            .withColumn("rel", (F.col("label") == F.col("qlabel"))
                        .cast("long")))
    wcum = (Window.partitionBy("qid").orderBy("r")
            .rowsBetween(Window.unboundedPreceding, 0))
    disc = F.array(*[F.lit(d) for d in _DISC_E9])
    hits = (hits.withColumn("cumrel", F.sum("rel").over(wcum))
            .withColumn("ap_term",
                        F.col("rel") * F.col("cumrel")
                        * F.expr(f"{_AP_LCM} div r"))
            .withColumn("dcg_term",
                        F.col("rel") * F.element_at(disc, F.col("r")
                                                    .cast("int"))))
    # total relevant in the corpus per label = label frequency - 1 (self)
    lfreq = (labels.groupBy("label")
             .agg((F.count(F.lit(1)) - 1).alias("n_rel"))
             .withColumnRenamed("label", "qlabel"))
    idcg = F.array(*[F.lit(v) for v in _IDCG_E9])
    per_probe = (hits.groupBy("qid", "qlabel")
                 .agg(F.min(F.when(F.col("rel") == 1, F.col("r")))
                      .alias("first_rel"),
                      F.sum("ap_term").alias("ap_num"),
                      F.sum("dcg_term").alias("dcg"))
                 .join(F.broadcast(lfreq), "qlabel")
                 .withColumn("r10", F.least(F.col("n_rel"), F.lit(RANK_K))))
    per_probe = (per_probe
                 .withColumn("mrr_e6",
                             F.coalesce(F.expr("1000000 div first_rel"),
                                        F.lit(0)))
                 .withColumn("ap_e6",
                             F.expr(f"(1000000 * ap_num) div "
                                    f"({_AP_LCM} * r10)"))
                 .withColumn("idcg_r", F.element_at(idcg, F.col("r10")
                                                   .cast("int")))
                 .withColumn("ndcg_e6",
                             F.expr("(1000000 * dcg) div idcg_r")))
    return (per_probe.groupBy("qlabel")
            .agg(F.count(F.lit(1)).alias("n_probes"),
                 F.expr("sum(mrr_e6) div count(*)").alias("mean_mrr_e6"),
                 F.expr("sum(ap_e6) div count(*)").alias("mean_ap_e6"),
                 F.expr("sum(ndcg_e6) div count(*)").alias("mean_ndcg_e6")))


def _ranking_metrics_sql() -> str:
    from .clustering import _QV, DIM

    disc = "[" + ", ".join(str(d) for d in _DISC_E9) + "]"
    idcg = "[" + ", ".join(str(v) for v in _IDCG_E9) + "]"
    return f"""
WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
probes AS (SELECT vec_id AS qid, v AS qv FROM vecs
           WHERE vec_id % {KNN_PROBE_MOD} = {KNN_PROBE_REM}),
pairs AS (
    SELECT p.qid, vecs.vec_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {DIM} + 1),
                   i -> (p.qv[i] - vecs.v[i]) * (p.qv[i] - vecs.v[i]))),
               (x, y) -> x + y) AS d
    FROM vecs CROSS JOIN probes p
    WHERE vecs.vec_id <> p.qid
),
top AS (
    SELECT qid, vec_id, r FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY d, vec_id) AS r
        FROM pairs
    ) WHERE r <= {RANK_K}
),
hits AS (
    SELECT t.qid, CAST(q.label AS BIGINT) AS qlabel, t.r,
           CASE WHEN CAST(e.label AS BIGINT) = CAST(q.label AS BIGINT)
                THEN 1 ELSE 0 END AS rel
    FROM top t
    JOIN embeddings e ON t.vec_id = e.vec_id
    JOIN embeddings q ON t.qid = q.vec_id
),
hc AS (
    SELECT qid, qlabel, r, rel,
           CAST(sum(rel) OVER (PARTITION BY qid ORDER BY r
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumrel
    FROM hits
),
lfreq AS (SELECT CAST(label AS BIGINT) AS qlabel,
                 count(*) - 1 AS n_rel
          FROM embeddings GROUP BY 1),
per AS (
    SELECT qid, qlabel,
           min(CASE WHEN rel = 1 THEN r END) AS first_rel,
           CAST(sum(rel * cumrel * ({_AP_LCM} // r)) AS BIGINT) AS ap_num,
           CAST(sum(rel * ({disc})[r]) AS BIGINT) AS dcg
    FROM hc GROUP BY 1, 2
),
per2 AS (
    SELECT per.*, least(n_rel, {RANK_K}) AS r10
    FROM per JOIN lfreq USING (qlabel)
),
per3 AS (
    SELECT qid, qlabel,
           coalesce(1000000 // first_rel, 0) AS mrr_e6,
           (1000000 * ap_num) // ({_AP_LCM} * r10) AS ap_e6,
           (1000000 * dcg) // ({idcg})[r10] AS ndcg_e6
    FROM per2
)
SELECT qlabel, count(*) AS n_probes,
       CAST(sum(mrr_e6) AS BIGINT) // count(*) AS mean_mrr_e6,
       CAST(sum(ap_e6) AS BIGINT) // count(*) AS mean_ap_e6,
       CAST(sum(ndcg_e6) AS BIGINT) // count(*) AS mean_ndcg_e6
FROM per3 GROUP BY qlabel
"""


QUERIES["ranking_metrics_eval"] = (_ranking_metrics_eval,
                                   _ranking_metrics_sql())


# ---------------------------------------------------------------------------
# Hard-negative mining over the embedding corpus
# ---------------------------------------------------------------------------
def _hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-learning margin audit: for every panel vector, find the
    nearest SAME-label neighbor (easiest positive) and the nearest
    DIFFERENT-label neighbor (hardest negative) and report, per label,
    how often the hard negative is closer than the positive — the
    violation rate that tells a contrastive-training pipeline which
    classes need mined triplets, and the exact margin mass available.
    Output: (qlabel, n_probes, n_violations, sum_margin_q,
    min_margin_q) where margin_q = d_neg − d_pos in quantized
    squared-L2 units (positive margin = correctly separated).

    Determinism: distances are exact integer squared-L2; both argmins
    are struct-min on (d, vec_id) (min_by tie-break is undefined,
    struct-min isn't); margins are exact int64 differences summed —
    no division anywhere, so negative-operand div semantics never
    arise.

    Scale: the ``knn_classifier_eval`` shape — broadcast panel ×
    corpus scan, no corpus shuffle, one (qid)-keyed aggregate and one
    tiny per-label rollup. Full-corpus mining would swap the brute
    pass for the ANN candidate generators and keep the margin algebra.
    """
    from .clustering import _quantized, _sq_dist

    emb = load(spark, sf_dir, "embeddings")
    vecs = _quantized(emb)
    labels = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    probes = (vecs.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
              .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    ptruth = (labels.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
              .select(F.col("vec_id").alias("qid"),
                      F.col("label").alias("qlabel")))
    pairs = (vecs.join(F.broadcast(probes), F.col("vec_id") != F.col("qid"))
             .withColumn("d", _sq_dist(F.col("qv"), F.col("v")))
             .join(labels, "vec_id")
             .join(F.broadcast(ptruth), "qid")
             .withColumn("rel", (F.col("label") == F.col("qlabel"))
                         .cast("int")))
    arg = lambda flag: F.min(F.when(F.col("rel") == flag,
                                    F.struct(F.col("d").alias("d"),
                                             F.col("vec_id").alias("v"))))
    per = (pairs.groupBy("qid", "qlabel")
           .agg(arg(1).alias("pos"), arg(0).alias("neg"))
           .select("qid", "qlabel",
                   F.col("pos.d").alias("d_pos"),
                   F.col("neg.d").alias("d_neg"))
           .withColumn("margin_q", F.col("d_neg") - F.col("d_pos")))
    return (per.groupBy("qlabel")
            .agg(F.count(F.lit(1)).alias("n_probes"),
                 F.sum(F.when(F.col("margin_q") < 0, 1).otherwise(0))
                  .cast("long").alias("n_violations"),
                 F.sum("margin_q").alias("sum_margin_q"),
                 F.min("margin_q").alias("min_margin_q")))


def _hard_negative_sql() -> str:
    from .clustering import _QV, DIM

    return f"""
WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
probes AS (SELECT vec_id AS qid, v AS qv FROM vecs
           WHERE vec_id % {KNN_PROBE_MOD} = {KNN_PROBE_REM}),
pairs AS (
    SELECT p.qid, CAST(q.label AS BIGINT) AS qlabel, vecs.vec_id,
           CASE WHEN CAST(e.label AS BIGINT) = CAST(q.label AS BIGINT)
                THEN 1 ELSE 0 END AS rel,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {DIM} + 1),
                   i -> (p.qv[i] - vecs.v[i]) * (p.qv[i] - vecs.v[i]))),
               (x, y) -> x + y) AS d
    FROM vecs
    CROSS JOIN probes p
    JOIN embeddings e ON vecs.vec_id = e.vec_id
    JOIN embeddings q ON p.qid = q.vec_id
    WHERE vecs.vec_id <> p.qid
),
per AS (
    SELECT qid, qlabel,
           (min(CASE WHEN rel = 1
                     THEN struct_pack(d := d, v := vec_id) END)).d AS d_pos,
           (min(CASE WHEN rel = 0
                     THEN struct_pack(d := d, v := vec_id) END)).d AS d_neg
    FROM pairs GROUP BY 1, 2
)
SELECT qlabel, count(*) AS n_probes,
       CAST(sum(CASE WHEN d_neg - d_pos < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
       CAST(sum(d_neg - d_pos) AS BIGINT) AS sum_margin_q,
       min(d_neg - d_pos) AS min_margin_q
FROM per GROUP BY qlabel
"""


QUERIES["hard_negative_mining"] = (_hard_negative_mining,
                                   _hard_negative_sql())


# ---------------------------------------------------------------------------
# Gini-gain feature ranking (feature selection for the quality filter)
# ---------------------------------------------------------------------------
_GINI_E9 = 1_000_000_000


def _gini_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranks candidate document features by Gini impurity reduction
    against the ``logreg_train_fixed_point`` label (lang = 'en') — the
    filter-method feature selection a team runs BEFORE spending a
    training cycle: a feature whose gain is ~0 can be dropped from the
    quality classifier without training anything. Chi-square
    (``chi2_independence``) tests dependence; this ranks by the
    impurity criterion tree learners actually split on (the multi-way
    sibling of ``decision_stump_split_search``'s binary threshold).
    Output: one row per feature (feature, n_values, parent_g_e9,
    child_g_e9, gain_e9, rank).

    Determinism: the metric is DEFINED as integer arithmetic — parent
    impurity floor(1e9·(n²−S)/n²), weighted child impurity
    Σ_v floor(1e9·(n_v²−S_v)/(n·n_v)) with S = Σ_class count² — so
    both engines compute identical integers (each floor is one int64
    division; gain may differ from the real-valued Gini by < #values
    ulps-of-1e-9, irrelevant for ranking). Rank ties break on feature
    name. int64 headroom: 1e9·n² needs n ≲ 3e6 rows — past that,
    sample the audit or widen to DECIMAL(38).

    Scale: ONE corpus scan — the features melt into (feature, value,
    label) rows scan-side and aggregate in one map-side-combinable
    (feature, value)-keyed pass, group counts bounded by the value
    domains; output is 4 rows at any input scale.
    """
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    base = docs.select(
        F.col("source").alias("f_source"),
        F.expr("n_chars div 200").alias("f_chars_bucket"),
        (n_tokens.cast("long") / F.lit(20)).cast("long").alias("_tb"),
        F.expr("n_chars").alias("_nc"),
        n_tokens.cast("long").alias("_nt"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
         .cast("long").alias("y"))
    base = (base
            .withColumn("f_tokens_bucket", F.expr("_nt div 20"))
            .withColumn("f_avg_toklen",
                        F.expr("_nc div greatest(_nt, 1)"))
            .drop("_tb", "_nc", "_nt"))
    glob = F.broadcast(base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("c1")))
    # melt the four features into (feature, value-as-string, y) rows:
    # ONE corpus scan and ONE (feature, value)-keyed shuffle replace
    # four per-feature scans (the long→string cast is injective, so
    # group counts match the oracle's native-typed grouping)
    melt = base.select(F.explode(F.array(*[
        F.struct(F.lit(feat.removeprefix("f_")).alias("f"),
                 F.col(feat).cast("string").alias("v"),
                 F.col("y").alias("y"))
        for feat in ("f_source", "f_chars_bucket", "f_tokens_bucket",
                     "f_avg_toklen")])).alias("m")) \
        .select("m.f", "m.v", "m.y")
    grp = (melt.groupBy("f", "v")
           .agg(F.count(F.lit(1)).alias("nv"), F.sum("y").alias("cv1")))
    child = (grp.crossJoin(glob)
             .withColumn("term", F.expr(
                 f"({_GINI_E9} * (nv * nv - cv1 * cv1"
                 f" - (nv - cv1) * (nv - cv1))) div (n * nv)"))
             .groupBy("f")
             .agg(F.sum("term").alias("child_g_e9"),
                  F.count(F.lit(1)).alias("n_values")))
    out = (child.crossJoin(glob)
           .select(F.col("f").alias("feature"), "n_values",
                   F.expr(f"({_GINI_E9} * (n * n - c1 * c1"
                          f" - (n - c1) * (n - c1))) div (n * n)")
                    .alias("parent_g_e9"),
                   "child_g_e9")
           .withColumn("gain_e9",
                       F.col("parent_g_e9") - F.col("child_g_e9")))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("gain_e9"), "feature")
    # 4-row frame: the global window is a no-op at scale
    return out.withColumn("rank", F.row_number().over(w))


def _gini_ranking_sql() -> str:
    feats = {
        "source": "source",
        "chars_bucket": "n_chars // 200",
        "tokens_bucket": r"len(regexp_split_to_array(trim(text), '\s+')) // 20",
        "avg_toklen": (r"n_chars // greatest("
                       r"len(regexp_split_to_array(trim(text), '\s+')), 1)"),
    }
    parts = []
    for name, expr in feats.items():
        parts.append(f"""
SELECT '{name}' AS feature,
       (SELECT count(*) FROM (SELECT {expr} AS v FROM documents
                              GROUP BY 1)) AS n_values,
       (SELECT ({_GINI_E9} * (n * n - c1 * c1 - (n - c1) * (n - c1)))
               // (n * n) FROM g) AS parent_g_e9,
       (SELECT CAST(sum(({_GINI_E9} * (nv * nv - cv1 * cv1
                          - (nv - cv1) * (nv - cv1))) // (g.n * nv))
                    AS BIGINT)
        FROM (SELECT {expr} AS v, count(*) AS nv,
                     CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                          AS BIGINT) AS cv1
              FROM documents GROUP BY 1) CROSS JOIN g) AS child_g_e9"""
                     )
    sel = " UNION ALL ".join(parts)
    return f"""
WITH g AS (SELECT count(*) AS n,
                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS BIGINT) AS c1
           FROM documents),
base AS ({sel})
SELECT feature, n_values, parent_g_e9, child_g_e9,
       parent_g_e9 - child_g_e9 AS gain_e9,
       row_number() OVER (ORDER BY parent_g_e9 - child_g_e9 DESC, feature)
           AS rank
FROM base
"""


QUERIES["gini_feature_ranking"] = (_gini_feature_ranking,
                                   _gini_ranking_sql())


# ---------------------------------------------------------------------------
# Split-conformal prediction interval calibration
# ---------------------------------------------------------------------------
CONF_ALPHA_NUM, CONF_ALPHA_DEN = 9, 10   # 1 - alpha = 90% target coverage


def _conformal_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of a naive pricing model — the
    distribution-free uncertainty wrapper modern ML deployments put
    around ANY point predictor: predict l_extendedprice as
    quantity × part retail price, take the ceil((1−α)(n+1))-th
    smallest absolute residual on a calibration split as the interval
    half-width q, and report the EMPIRICAL coverage of pred ± q on the
    disjoint test split. Conformal theory guarantees coverage ≥ 1−α on
    exchangeable data regardless of how wrong the model is — the
    invariant test asserts exactly that bound. Output (one row):
    n_cal, n_test, k_rank, q_cents, coverage_e6, target_e6.

    Determinism: residuals are exact cents; the calibration quantile
    is an exact RANK selection via the ``auc_mann_whitney`` run-table
    trick (group residuals into value runs, one tiny window over the
    run table, pick min value with cumulative count ≥ k) — never an
    engine percentile; coverage is an integer div. The split keys on
    (l_orderkey·8 + l_linenumber) % 5 so both engines cut identically.

    Scale: one scan joins part broadcast-style (part is the small
    side); the run table is residual-cardinality-sized (≪ rows after
    cents quantization); no global sort of the fact table anywhere.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("cast(round(l_quantity, 0) as bigint)").alias("qty"),
        F.expr("cast(round(l_extendedprice * 100, 0) as bigint)")
         .alias("actual_c"),
        ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) % 5)
        .alias("split"))
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("cast(round(p_retailprice * 100, 0) as bigint)")
         .alias("unit_c"))
    scored = (li.join(F.broadcast(part),
                      F.col("l_partkey") == F.col("p_partkey"))
              .select("split",
                      F.abs(F.col("actual_c")
                            - F.col("qty") * F.col("unit_c"))
                       .alias("resid")))
    cal = scored.where(F.col("split") < 2)
    test = scored.where(F.col("split") >= 2)
    ncal = F.broadcast(cal.agg(F.count(F.lit(1)).alias("n_cal")))
    runs = cal.groupBy("resid").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window
    w = (Window.orderBy("resid")
         .rowsBetween(Window.unboundedPreceding, 0))
    ranked = runs.select("resid", F.sum("cnt").over(w).alias("cum"))
    k_expr = (f"({CONF_ALPHA_NUM} * (n_cal + 1) + {CONF_ALPHA_DEN} - 1)"
              f" div {CONF_ALPHA_DEN}")
    q = (ranked.crossJoin(ncal)
         .where(F.col("cum") >= F.expr(k_expr))
         .agg(F.min("resid").alias("q_cents")))
    cov = (test.crossJoin(F.broadcast(q))
           .agg(F.count(F.lit(1)).alias("n_test"),
                F.sum((F.col("resid") <= F.col("q_cents")).cast("long"))
                 .alias("covered")))
    return (ncal.crossJoin(F.broadcast(q)).crossJoin(F.broadcast(cov))
            .select("n_cal", "n_test",
                    F.expr(k_expr).alias("k_rank"),
                    "q_cents",
                    F.expr("(1000000 * covered) div n_test")
                     .alias("coverage_e6"),
                    F.lit(1000000 * CONF_ALPHA_NUM // CONF_ALPHA_DEN)
                     .cast("long").alias("target_e6")))


_CONFORMAL_SQL = f"""
WITH scored AS (
    SELECT (l.l_orderkey * 8 + l.l_linenumber) % 5 AS split,
           abs(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               - CAST(round(l.l_quantity, 0) AS BIGINT)
                 * CAST(round(p.p_retailprice * 100, 0) AS BIGINT))
               AS resid
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cal AS (SELECT resid FROM scored WHERE split < 2),
test AS (SELECT resid FROM scored WHERE split >= 2),
ncal AS (SELECT count(*) AS n_cal FROM cal),
runs AS (SELECT resid, count(*) AS cnt FROM cal GROUP BY resid),
ranked AS (
    SELECT resid, CAST(sum(cnt) OVER (ORDER BY resid
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum
    FROM runs
),
kk AS (SELECT ({CONF_ALPHA_NUM} * (n_cal + 1) + {CONF_ALPHA_DEN} - 1)
              // {CONF_ALPHA_DEN} AS k_rank FROM ncal),
q AS (SELECT min(resid) AS q_cents FROM ranked CROSS JOIN kk
      WHERE cum >= k_rank),
cov AS (SELECT count(*) AS n_test,
               CAST(sum(CASE WHEN resid <= q_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS covered
        FROM test CROSS JOIN q)
SELECT ncal.n_cal, cov.n_test, kk.k_rank, q.q_cents,
       (1000000 * cov.covered) // cov.n_test AS coverage_e6,
       CAST({1000000 * CONF_ALPHA_NUM // CONF_ALPHA_DEN} AS BIGINT)
           AS target_e6
FROM ncal CROSS JOIN kk CROSS JOIN q CROSS JOIN cov
"""

QUERIES["conformal_prediction_eval"] = (_conformal_prediction_eval,
                                        _CONFORMAL_SQL)


# ---------------------------------------------------------------------------
# Bagged stump ensemble (random-forest-lite) with out-of-bag evaluation
# ---------------------------------------------------------------------------
RF_BAGS = 5


def _bagged_stump_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-forest-in-miniature over the embedding table: {b} bagged
    decision stumps, each trained on a deterministic ~2/3 bootstrap
    (md5(vec_id:bag) % 3 != 0) restricted to its own feature subset
    (dims where dim % {b} == bag), evaluated out-of-bag — solo stump
    OOB accuracy per bag, plus the majority-vote ENSEMBLE's OOB
    accuracy (the free generalization estimate bagging buys; expected
    ensemble > mean solo). Completes the tree-learning family:
    ``decision_stump_split_search`` is the split kernel, this is the
    ensemble + eval loop around it. Output: one row per bag
    (bag, dim, thr, left_label, right_label, n_inbag, n_oob,
    correct_e6) and a bag = -1 ensemble row (dim/thr/labels = -1).

    Determinism: split search scores by the stump op's exact-count
    rational (one double division; argmin via struct-min on
    (-score, dim, thr)); leaf labels and votes are struct-min argmax
    with label tie-break; bags/OOB membership hash md5 through the
    12-hex idiom. Accuracies are integer e6 div.

    Scale: ONE conditional-tally pass per bag over in-bag rows
    (map-side combinable, the XGBoost-histogram shape), candidate
    grids broadcast; OOB scoring joins each vector's {dims} rows
    against the {b}-row broadcast model. Nothing all-pairs, nothing
    range-partitioned.
    """.format(b=RF_BAGS, dims=_STUMP_DIMS)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.transform(F.slice("embedding", 1, _STUMP_DIMS),
                    lambda x: F.round(x * 1000).cast("long")).alias("q"))
    rows = emb.select("vec_id", "label",
                      F.posexplode("q").alias("dim", "val"))
    bag_of = F.explode(F.sequence(F.lit(0), F.lit(RF_BAGS - 1))).alias("bag")
    inbag = (F.pmod(F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("vec_id").cast("string"),
                          F.col("bag").cast("string"))), 1, 12), 16, 10)
        .cast("long"), F.lit(3)) != 0)
    brows = (rows.select("vec_id", "label", "dim", "val", bag_of)
             .where(F.col("dim") % RF_BAGS == F.col("bag"))
             .withColumn("inb", inbag))
    stats = rows.groupBy("dim").agg(F.min("val").alias("lo"),
                                    F.max("val").alias("hi"))
    cuts = (stats.select(
        "dim", F.explode(F.array(*[F.lit(t) for t in
                                   range(1, _STUMP_CUTS + 1)])).alias("t"),
        "lo", "hi")
        .select("dim", F.floor(F.col("lo") + (F.col("hi") - F.col("lo"))
                               * F.col("t") / (_STUMP_CUTS + 1))
                .cast("long").alias("thr")))
    tallies = (brows.where("inb")
               .join(F.broadcast(cuts), "dim")
               .groupBy("bag", "dim", "thr", "label")
               .agg(F.sum(F.when(F.col("val") <= F.col("thr"), 1)
                          .otherwise(0)).alias("cl"),
                    F.count(F.lit(1)).alias("ctot")))
    per_split = (tallies.groupBy("bag", "dim", "thr")
                 .agg(F.sum("cl").alias("n_l"),
                      F.sum(F.col("ctot") - F.col("cl")).alias("n_r"),
                      F.sum(F.col("cl") * F.col("cl")).alias("sl2"),
                      F.sum((F.col("ctot") - F.col("cl"))
                            * (F.col("ctot") - F.col("cl"))).alias("sr2"))
                 .where((F.col("n_l") > 0) & (F.col("n_r") > 0)))
    score = ((F.col("sl2") * F.col("n_r") + F.col("sr2") * F.col("n_l"))
             .cast("double") / (F.col("n_l") * F.col("n_r")).cast("double"))
    best = (per_split.withColumn("s", score)
            .groupBy("bag")
            .agg(F.min(F.struct((-F.col("s")).alias("ns"),
                                F.col("dim").alias("dim"),
                                F.col("thr").alias("thr"))).alias("b"))
            .select("bag", F.col("b.dim").alias("dim"),
                    F.col("b.thr").alias("thr")))
    leafs = (tallies.join(F.broadcast(best), ["bag", "dim", "thr"])
             .groupBy("bag", "dim", "thr")
             .agg(F.min(F.struct((-F.col("cl")).alias("nc"),
                                 F.col("label").alias("lab")))
                  .getField("lab").alias("left_label"),
                 F.min(F.struct((F.col("cl") - F.col("ctot")).alias("nc"),
                                F.col("label").alias("lab")))
                  .getField("lab").alias("right_label")))
    model = F.broadcast(best.join(leafs, ["bag", "dim", "thr"]))
    scored = (rows.join(model.withColumnRenamed("dim", "mdim"),
                        F.col("dim") == F.col("mdim"))
              .withColumn("inb", inbag)
              .where(~F.col("inb"))
              .withColumn("pred",
                          F.when(F.col("val") <= F.col("thr"),
                                 F.col("left_label"))
                           .otherwise(F.col("right_label"))))
    solo = (scored.groupBy("bag")
            .agg(F.count(F.lit(1)).alias("n_oob"),
                 F.sum((F.col("pred") == F.col("label")).cast("long"))
                  .alias("n_correct")))
    sizes = (emb.select("vec_id", bag_of)
             .withColumn("inb", inbag)
             .groupBy("bag")
             .agg(F.sum(F.col("inb").cast("long")).alias("n_inbag")))
    per_bag = (model.join(solo, "bag").join(sizes, "bag")
               .select("bag", "dim", "thr", "left_label", "right_label",
                       "n_inbag", "n_oob",
                       F.expr("(1000000 * n_correct) div n_oob")
                        .alias("correct_e6")))
    votes = (scored.groupBy("vec_id", "label", "pred")
             .agg(F.count(F.lit(1)).alias("cnt")))
    voted = (votes.groupBy("vec_id", "label")
             .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                 F.col("pred").alias("p")))
                  .getField("p").alias("vote")))
    ens = (voted.agg(F.count(F.lit(1)).alias("n_oob"),
                     F.sum((F.col("vote") == F.col("label")).cast("long"))
                      .alias("n_correct"))
           .select(F.lit(-1).cast("int").alias("bag"),
                   F.lit(-1).alias("dim"),
                   F.lit(-1).cast("long").alias("thr"),
                   F.lit(-1).cast("long").alias("left_label"),
                   F.lit(-1).cast("long").alias("right_label"),
                   F.lit(-1).cast("long").alias("n_inbag"),
                   "n_oob",
                   F.expr("(1000000 * n_correct) div n_oob")
                    .alias("correct_e6")))
    return per_bag.unionByName(ens)


def _bagged_sql() -> str:
    md5i = ("CAST('0x' || substr(md5(CAST({v} AS VARCHAR) || ':' || "
            "CAST({b} AS VARCHAR)), 1, 12) AS BIGINT)")
    inb_r = md5i.format(v="r.vec_id", b="b.bag") + " % 3 <> 0"
    oob_m = md5i.format(v="r.vec_id", b="m.bag") + " % 3 = 0"
    inb_e = md5i.format(v="e.vec_id", b="b.bag") + " % 3 <> 0"
    return f"""
WITH rows_q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, u.dim, u.val
  FROM (
    SELECT vec_id, label,
           unnest(list_transform(range(1, {_STUMP_DIMS} + 1),
               i -> struct_pack(dim := i - 1,
                                val := CAST(round(embedding[i] * 1000)
                                            AS BIGINT)))) AS u
    FROM embeddings
  )
),
bags AS (SELECT unnest(range(0, {RF_BAGS})) AS bag),
brows AS (
  SELECT r.vec_id, r.label, r.dim, r.val, b.bag, {inb_r} AS inb
  FROM rows_q r JOIN bags b ON r.dim % {RF_BAGS} = b.bag
),
stats AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM rows_q
          GROUP BY 1),
cuts AS (
  SELECT dim, CAST(floor(lo + (hi - lo) * t / {_STUMP_CUTS + 1})
              AS BIGINT) AS thr
  FROM stats, unnest(range(1, {_STUMP_CUTS} + 1)) AS r(t)
),
tallies AS (
  SELECT w.bag, w.dim, c.thr, w.label,
         CAST(sum(CASE WHEN w.val <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
             AS cl,
         CAST(count(*) AS BIGINT) AS ctot
  FROM brows w JOIN cuts c ON w.dim = c.dim
  WHERE w.inb
  GROUP BY 1, 2, 3, 4
),
per_split AS (
  SELECT bag, dim, thr,
         CAST(sum(cl) AS BIGINT) AS n_l,
         CAST(sum(ctot - cl) AS BIGINT) AS n_r,
         CAST(sum(cl * cl) AS BIGINT) AS sl2,
         CAST(sum((ctot - cl) * (ctot - cl)) AS BIGINT) AS sr2
  FROM tallies GROUP BY 1, 2, 3
),
best AS (
  SELECT bag,
         (min(struct_pack(
             ns := -((sl2 * n_r + sr2 * n_l) / CAST(n_l * n_r AS DOUBLE)),
             dim := dim, thr := thr))).dim AS dim,
         (min(struct_pack(
             ns := -((sl2 * n_r + sr2 * n_l) / CAST(n_l * n_r AS DOUBLE)),
             dim := dim, thr := thr))).thr AS thr
  FROM per_split WHERE n_l > 0 AND n_r > 0
  GROUP BY bag
),
leafs AS (
  SELECT t.bag, t.dim, t.thr,
         (min(struct_pack(nc := -t.cl, lab := t.label))).lab
             AS left_label,
         (min(struct_pack(nc := t.cl - t.ctot, lab := t.label))).lab
             AS right_label
  FROM tallies t JOIN best USING (bag, dim, thr)
  GROUP BY 1, 2, 3
),
model AS (
  SELECT b.bag, b.dim, b.thr, l.left_label, l.right_label
  FROM best b JOIN leafs l USING (bag, dim, thr)
),
scored AS (
  SELECT m.bag, r.vec_id, r.label,
         CASE WHEN r.val <= m.thr THEN m.left_label
              ELSE m.right_label END AS pred
  FROM rows_q r JOIN model m ON r.dim = m.dim
  WHERE {oob_m}
),
solo AS (
  SELECT bag, count(*) AS n_oob,
         CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
  FROM scored GROUP BY bag
),
sizes AS (
  SELECT b.bag,
         CAST(sum(CASE WHEN {inb_e} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inbag
  FROM embeddings e CROSS JOIN bags b
  GROUP BY b.bag
),
per_bag AS (
  SELECT m.bag, m.dim, m.thr, m.left_label, m.right_label,
         z.n_inbag, s.n_oob,
         (1000000 * s.n_correct) // s.n_oob AS correct_e6
  FROM model m JOIN solo s USING (bag) JOIN sizes z USING (bag)
),
votes AS (SELECT vec_id, label, pred, count(*) AS cnt FROM scored
          GROUP BY 1, 2, 3),
voted AS (
  SELECT vec_id, label,
         (min(struct_pack(nc := -cnt, p := pred))).p AS vote
  FROM votes GROUP BY 1, 2
),
ens AS (
  SELECT CAST(-1 AS BIGINT) AS bag, CAST(-1 AS BIGINT) AS dim,
         CAST(-1 AS BIGINT) AS thr, CAST(-1 AS BIGINT) AS left_label,
         CAST(-1 AS BIGINT) AS right_label, CAST(-1 AS BIGINT) AS n_inbag,
         count(*) AS n_oob,
         (1000000 * CAST(sum(CASE WHEN vote = label THEN 1 ELSE 0 END)
                         AS BIGINT)) // count(*) AS correct_e6
  FROM voted
)
SELECT CAST(bag AS INT) AS bag, CAST(dim AS INT) AS dim, thr,
       left_label, right_label, n_inbag, n_oob, correct_e6
FROM per_bag
UNION ALL
SELECT CAST(bag AS INT), CAST(dim AS INT), thr, left_label,
       right_label, n_inbag, n_oob, correct_e6
FROM ens
"""


QUERIES["bagged_stump_ensemble"] = (_bagged_stump_ensemble, _bagged_sql())


# ---------------------------------------------------------------------------
# Confusion-matrix metric suite: MCC, F-beta, balanced accuracy, Youden J
# ---------------------------------------------------------------------------

_CM_THRESHOLD = 0.06  # stopword-ratio cut predicting lang == 'en'


def _confusion_metric_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full binary-classification report card from one confusion
    matrix: Matthews correlation (the metric of choice under class
    imbalance — accuracy and F1 both inflate there), F1, F2
    (recall-weighted), balanced accuracy, and Youden's J, evaluating
    the stopword-ratio language heuristic (pred = en-stopword ratio ≥
    0.06) against the gold ``lang == 'en'`` label. On this synthetic
    corpus the classifier is near chance (MCC ≈ 0) — the query
    certifies the exact metric arithmetic, and swapping in any real
    scorer changes only the ``pred`` expression.

    Determinism: the four cells are exact int64 from one
    map-side-combinable aggregate. MCC's denominator is written as a
    PRODUCT OF FOUR SQRTS of exact ints (each ≤ 2^53 → each sqrt
    IEEE-correctly-rounded; left-assoc multiply), never sqrt of the
    4-factor product (which exceeds 2^53 and would round before the
    sqrt); F-beta and the rate sums are single double divisions of
    exact ints, identical expressions in both engines, floored e6.

    Scale: featurize+threshold fuse into the scan; one global
    aggregate to 4 integers; everything after is a 1-row select.
    """
    from ..functions import text as T

    docs = load(spark, sf_dir, "documents").select(
        (T.stopword_ratio(F.col("text")) >= _CM_THRESHOLD).alias("p"),
        (F.col("lang") == "en").alias("y"))
    cells = docs.agg(
        F.sum(F.when(F.col("p") & F.col("y"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("p") & ~F.col("y"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("p") & F.col("y"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("p") & ~F.col("y"), 1).otherwise(0)).alias("tn"))
    mcc = ("cast(floor(1000000.0 * (cast(tp as double) * tn"
           " - cast(fp as double) * fn)"
           " / (sqrt(cast(tp + fp as double)) * sqrt(cast(tp + fn as double))"
           " * sqrt(cast(tn + fp as double)) * sqrt(cast(tn + fn as double)))"
           ") as bigint)")
    return cells.select(
        "tp", "fp", "fn", "tn",
        F.expr(f"case when least(tp + fp, tp + fn, tn + fp, tn + fn) > 0"
               f" then {mcc} end").alias("mcc_e6"),
        F.expr("cast(floor(1000000.0 * (2 * tp)"
               " / (2 * tp + fp + fn)) as bigint)").alias("f1_e6"),
        F.expr("cast(floor(1000000.0 * (5 * tp)"
               " / (5 * tp + 4 * fn + fp)) as bigint)").alias("f2_e6"),
        F.expr("cast(floor(1000000.0 * (cast(tp as double) / (tp + fn)"
               " + cast(tn as double) / (tn + fp)) / 2.0) as bigint)")
        .alias("bal_acc_e6"),
        F.expr("cast(floor(1000000.0 * (cast(tp as double) / (tp + fn)"
               " + cast(tn as double) / (tn + fp) - 1.0)) as bigint)")
        .alias("youden_e6"))


def _confusion_sql() -> str:
    from ..functions import text_queries as TQ

    sr = TQ.sql_stopword_ratio()
    mcc = ("CAST(floor(1000000.0 * (CAST(tp AS DOUBLE) * tn"
           " - CAST(fp AS DOUBLE) * fn)"
           " / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))"
           " * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE)))"
           ") AS BIGINT)")
    return f"""
WITH labeled AS (
  SELECT {sr} >= {_CM_THRESHOLD} AS p, lang = 'en' AS y FROM documents
), cells AS (
  SELECT
    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM labeled
)
SELECT tp, fp, fn, tn,
       CASE WHEN least(tp + fp, tp + fn, tn + fp, tn + fn) > 0
            THEN {mcc} END AS mcc_e6,
       CAST(floor(1000000.0 * (2 * tp) / (2 * tp + fp + fn)) AS BIGINT)
           AS f1_e6,
       CAST(floor(1000000.0 * (5 * tp) / (5 * tp + 4 * fn + fp)) AS BIGINT)
           AS f2_e6,
       CAST(floor(1000000.0 * (CAST(tp AS DOUBLE) / (tp + fn)
            + CAST(tn AS DOUBLE) / (tn + fp)) / 2.0) AS BIGINT)
           AS bal_acc_e6,
       CAST(floor(1000000.0 * (CAST(tp AS DOUBLE) / (tp + fn)
            + CAST(tn AS DOUBLE) / (tn + fp) - 1.0)) AS BIGINT)
           AS youden_e6
FROM cells
"""


QUERIES["confusion_metric_suite"] = (_confusion_metric_suite,
                                     _confusion_sql())


# ---------------------------------------------------------------------------
# Weight-of-evidence / information-value feature binning
# ---------------------------------------------------------------------------

_WOE_BINS = 8
_WOE_LO, _WOE_HI = -100_000, 1_000_000  # exact cents bounds (driver gen)


def _woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence table for account balance predicting the
    "places urgent orders" event — the credit-scoring featurization
    (bin a numeric, replace it by ln(event-rate ratio) per bin) that
    doubles as the information-value screen for feature selection.
    Per equal-width cents bin i: events e_i / non-events g_i, and
    ``WoE_i = ln((e_i+1)(G+B') / ((g_i+1)(E+B')))`` with +1 Laplace
    cells (B' = bins, keeping every input an exact integer), plus the
    IV contribution ``(e_i/E − g_i/G)·WoE_i``.

    Determinism: bins come from the width_bucket floor formula on
    exact cents (CLAUDE.md — never an engine ntile); ln receives one
    double division of exact-int products (< 2^53, bit-identical
    inputs), and outputs are display-rounded (4 dp WoE / 6 dp IV),
    the ngram-LM convention for transcendental outputs.

    Scale: one custkey-keyed semi-aggregate over orders for the
    label, one map-side-combinable bin aggregate; the report is
    ``_WOE_BINS`` rows at any corpus size.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"))
    urgent = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey").distinct())
    span = _WOE_HI - _WOE_LO
    labeled = (cust.join(urgent,
                         cust.c_custkey == urgent.o_custkey, "left")
               .select(
                   F.least(F.lit(_WOE_BINS - 1),
                           F.expr(f"(bal_c - ({_WOE_LO})) * {_WOE_BINS}"
                                  f" div {span}")).alias("bin"),
                   F.col("o_custkey").isNotNull().cast("long").alias("y")))
    bins = (labeled.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_cust"),
                 F.sum("y").alias("events")))
    tot = F.broadcast(bins.agg(
        F.sum("events").alias("te"),
        F.sum(F.col("n_cust") - F.col("events")).alias("tg")))
    woe = (f"round(ln((cast(events + 1 as double) * (tg + {_WOE_BINS}))"
           f" / (cast(n_cust - events + 1 as double)"
           f" * (te + {_WOE_BINS}))), 4)")
    return (bins.crossJoin(tot)
            .select("bin", "n_cust", "events",
                    (F.col("n_cust") - F.col("events")).alias("nonevents"),
                    F.expr(woe).alias("woe_e4"),
                    F.expr(f"round((cast(events as double) / te"
                           f" - cast(n_cust - events as double) / tg)"
                           f" * ({woe}), 6)").alias("iv_term_e6")))


def _woe_sql() -> str:
    span = _WOE_HI - _WOE_LO
    woe = (f"round(ln((CAST(events + 1 AS DOUBLE) * (tg + {_WOE_BINS}))"
           f" / (CAST(n_cust - events + 1 AS DOUBLE)"
           f" * (te + {_WOE_BINS}))), 4)")
    return f"""
WITH cust AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
), urgent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), labeled AS (
  SELECT least({_WOE_BINS - 1},
               (bal_c - ({_WOE_LO})) * {_WOE_BINS} // {span}) AS bin,
         CAST(u.o_custkey IS NOT NULL AS BIGINT) AS y
  FROM cust c LEFT JOIN urgent u ON c.c_custkey = u.o_custkey
), bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(y) AS BIGINT) AS events
  FROM labeled GROUP BY bin
), tot AS (
  SELECT CAST(sum(events) AS BIGINT) AS te,
         CAST(sum(n_cust - events) AS BIGINT) AS tg
  FROM bins
)
SELECT bin, n_cust, events, n_cust - events AS nonevents,
       {woe} AS woe_e4,
       round((CAST(events AS DOUBLE) / te
              - CAST(n_cust - events AS DOUBLE) / tg) * ({woe}), 6)
           AS iv_term_e6
FROM bins CROSS JOIN tot
"""


QUERIES["woe_iv_binning"] = (_woe_iv_binning, _woe_sql())


# ---------------------------------------------------------------------------
# RANSAC line fit: robust regression by deterministic consensus sampling
# ---------------------------------------------------------------------------

_RANSAC_C = 16      # candidate models (point pairs)
_RANSAC_TOL = 3     # inlier band: |y - line(x)| <= 3 words


def _ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC over the (n_chars → word-count) relation of the corpus:
    fit the robust consensus line through deterministic 2-point
    samples, then OLS-refit on the winner's inliers — the outlier-
    immune alternative to ols_normal_equations (one pasted boilerplate
    doc with few words per char cannot drag this slope the way it
    drags least squares). theil_sen_trend is the all-pairs robust
    sibling; RANSAC is the one you can afford when the corpus is huge
    and all-pairs is not.

    Determinism: the "random" samples are md5-ranked rows paired
    consecutively (the training_order_shuffle idiom — no RNG);
    candidate lines stay RATIONAL (dy/dx int64); the inlier test is
    the cross-multiplied |(y-y1)·dx - (x-x1)·dy| <= TOL·|dx| — exact
    integers end-to-end. Only the final refit divides (IEEE-exact
    double ops on int64 moments, round 6).

    Scale: one scan for points, a 2C-row TakeOrdered for seeds, one
    broadcast of C≈16 candidate lines against the corpus with a
    map-side-combinable per-candidate count — linear in N, vs
    theil-sen's N² slopes. The refit is a second broadcast pass.
    int64 headroom: |r| <= y_max·dx_max ≈ 1e4·1e6 per row — fine.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    pts = docs.select(
        "doc_id", F.col("n_chars").alias("x"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("y"))
    # TakeOrdered (per-partition top-2C, k-row merge) picks the seed
    # rows distributed; the row_number window then runs on the 2C-row
    # result, never on the corpus
    hk = F.unhex(F.md5(F.concat(F.lit("ransac:"), F.col("doc_id"))))
    seed_rows = (pts.select("doc_id", "x", "y", hk.alias("hk"))
                 .orderBy("hk", "doc_id").limit(2 * _RANSAC_C))
    w = Window.orderBy("hk", "doc_id")
    seeds = (seed_rows.withColumn("rn", F.row_number().over(w))
             .select(F.expr("(rn - 1) div 2").alias("cand"),
                     F.expr("(rn - 1) % 2").alias("slot"), "x", "y"))
    cands = (seeds.groupBy("cand")
             .agg(F.max(F.when(F.col("slot") == 0, F.col("x"))).alias("x1"),
                  F.max(F.when(F.col("slot") == 0, F.col("y"))).alias("y1"),
                  F.max(F.when(F.col("slot") == 1, F.col("x"))).alias("x2"),
                  F.max(F.when(F.col("slot") == 1, F.col("y"))).alias("y2"))
             .select("cand", "x1", "y1",
                     (F.col("x2") - F.col("x1")).alias("dx"),
                     (F.col("y2") - F.col("y1")).alias("dy"))
             .where(F.col("dx") != 0))
    r = (F.col("y") - F.col("y1")) * F.col("dx") \
        - (F.col("x") - F.col("x1")) * F.col("dy")
    scored = (pts.crossJoin(F.broadcast(cands))
              .select("cand",
                      (F.abs(r) <= _RANSAC_TOL * F.abs(F.col("dx")))
                      .cast("long").alias("inl")))
    best = (scored.groupBy("cand")
            .agg(F.sum("inl").alias("n_inliers"),
                 F.count(F.lit(1)).alias("n_points"))
            .orderBy(F.desc("n_inliers"), "cand").limit(1))
    refit = (pts.crossJoin(F.broadcast(
                best.join(cands, "cand")
                    .select("cand", "n_points", "n_inliers",
                            "x1", "y1", "dx", "dy")))
             .where(F.abs(r) <= _RANSAC_TOL * F.abs(F.col("dx")))
             .groupBy("cand", "n_points", "n_inliers", "dx", "dy")
             .agg(F.count(F.lit(1)).alias("n_refit"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy")))
    slope = ("(n_refit * sxy - sx * sy)"
             " / CAST(n_refit * sxx - sx * sx AS DOUBLE)")
    return refit.select(
        "cand", "n_points", "n_inliers", "dx", "dy", "n_refit",
        F.expr(f"round({slope}, 6)").alias("slope_r6"),
        F.expr(f"round((sy - ({slope}) * sx) / n_refit, 6)")
        .alias("intercept_r6"))


def _ransac_sql() -> str:
    slope = ("(n_refit * sxy - sx * sy)"
             " / CAST(n_refit * sxx - sx * sx AS DOUBLE)")
    return rf"""
WITH pts AS (
  SELECT doc_id, n_chars AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents WHERE length(text) > 0
),
ranked AS (
  SELECT x, y,
         row_number() OVER (ORDER BY unhex(md5('ransac:' || doc_id)),
                            doc_id) AS rn
  FROM pts
),
seeds AS (
  SELECT (rn - 1) // 2 AS cand, (rn - 1) % 2 AS slot, x, y
  FROM ranked WHERE rn <= {2 * _RANSAC_C}
),
cands AS (
  SELECT cand,
         max(CASE WHEN slot = 0 THEN x END) AS x1,
         max(CASE WHEN slot = 0 THEN y END) AS y1,
         max(CASE WHEN slot = 1 THEN x END) - max(CASE WHEN slot = 0
             THEN x END) AS dx,
         max(CASE WHEN slot = 1 THEN y END) - max(CASE WHEN slot = 0
             THEN y END) AS dy
  FROM seeds GROUP BY cand
  HAVING max(CASE WHEN slot = 1 THEN x END)
         <> max(CASE WHEN slot = 0 THEN x END)
),
scored AS (
  SELECT c.cand,
         CAST(abs((p.y - c.y1) * c.dx - (p.x - c.x1) * c.dy)
              <= {_RANSAC_TOL} * abs(c.dx) AS BIGINT) AS inl
  FROM pts p CROSS JOIN cands c
),
best AS (
  SELECT cand, CAST(sum(inl) AS BIGINT) AS n_inliers,
         CAST(count(*) AS BIGINT) AS n_points
  FROM scored GROUP BY cand
  ORDER BY n_inliers DESC, cand ASC LIMIT 1
),
refit AS (
  SELECT b.cand, b.n_points, b.n_inliers, c.dx, c.dy,
         CAST(count(*) AS BIGINT) AS n_refit,
         CAST(sum(p.x) AS BIGINT) AS sx, CAST(sum(p.y) AS BIGINT) AS sy,
         CAST(sum(p.x * p.x) AS BIGINT) AS sxx,
         CAST(sum(p.x * p.y) AS BIGINT) AS sxy
  FROM pts p
  CROSS JOIN best b
  JOIN cands c ON c.cand = b.cand
  WHERE abs((p.y - c.y1) * c.dx - (p.x - c.x1) * c.dy)
        <= {_RANSAC_TOL} * abs(c.dx)
  GROUP BY b.cand, b.n_points, b.n_inliers, c.dx, c.dy
)
SELECT cand, n_points, n_inliers, dx, dy, n_refit,
       round({slope}, 6) AS slope_r6,
       round((sy - ({slope}) * sx) / n_refit, 6) AS intercept_r6
FROM refit
"""


QUERIES["ransac_line_fit"] = (_ransac_line_fit, _ransac_sql())


# ---------------------------------------------------------------------------
# Average precision (PR-AUC) from score-run aggregates
# ---------------------------------------------------------------------------

def _pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware average precision (PR-AUC) of the same integer scorer
    as ``auc_mann_whitney`` (document length predicting lang='en') —
    the metric that matters when positives are rare and ROC-AUC
    flatters. Thresholds are the score RUNS in descending order:
    AP = Σ_runs (Δrecall · precision-at-run-end), i.e.
    Σ_i (p_i / P) · (cumpos_i / cumcnt_i). Each run's term is floored
    to e12 from exact int64 counts via IEEE double mul/div
    (deterministic cross-engine; the defined metric is this floored
    sum, biased < n_runs·1e-12 low), then integer-summed.

    Scale: identical shape to the AUC twin — one groupBy(score) run
    aggregation, one cumulative window over the alphabet-bounded run
    table, a 1-row reduce. No global per-row sort ever happens.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"))
    runs = docs.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("score"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = runs.select(
        "score", "cnt", "pos",
        F.sum("cnt").over(w).alias("cumcnt"),
        F.sum("pos").over(w).alias("cumpos"))
    tot = runs.agg(F.sum("pos").alias("p_total"),
                   F.sum("cnt").alias("n_total"))
    term = F.floor(
        F.lit(1e12)
        * (F.col("pos").cast("double") * F.col("cumpos").cast("double"))
        / (F.col("p_total").cast("double") * F.col("cumcnt").cast("double"))
    ).cast("long")
    return (cum.crossJoin(F.broadcast(tot))
            .agg(F.sum(term).alias("ap_e12"),
                 F.max("p_total").alias("n_pos"),
                 F.max("n_total").alias("n_total"),
                 F.count(F.lit(1)).alias("n_runs")))


_PR_AUC_SQL = """
WITH docs AS (
  SELECT CAST(n_chars AS BIGINT) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), runs AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM docs GROUP BY 1
), cum AS (
  SELECT score, cnt, pos,
         CAST(sum(cnt) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumcnt,
         CAST(sum(pos) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumpos
  FROM runs
), tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS p_total,
         CAST(sum(cnt) AS BIGINT) AS n_total
  FROM runs
)
SELECT CAST(sum(CAST(floor(
           1e12 * (CAST(pos AS DOUBLE) * CAST(cumpos AS DOUBLE))
           / (CAST(p_total AS DOUBLE) * CAST(cumcnt AS DOUBLE)))
           AS BIGINT)) AS BIGINT) AS ap_e12,
       max(p_total) AS n_pos, max(n_total) AS n_total,
       CAST(count(*) AS BIGINT) AS n_runs
FROM cum, tot
"""

QUERIES["pr_auc_average_precision"] = (_pr_auc_average_precision,
                                       _PR_AUC_SQL)


# ---------------------------------------------------------------------------
# Gradient-boosted stumps (3 rounds of L2 boosting, driver-paced argmax)
# ---------------------------------------------------------------------------
_GBDT_ROUNDS = 3
_GBDT_DIMS = _STUMP_DIMS
_GBDT_CUTS = _STUMP_CUTS


def _gbdt_stump_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 gradient boosting with regression stumps: 3 rounds of
    best-split search on the residual of "is this vector label 0"
    (y = 1000·1{label=0}, e3 fixed-point), learning rate 1/2 — the
    minimal honest GBDT whose every round is the distributed
    histogram-split pass of ``decision_stump_split_search``, now fit
    on RESIDUALS so rounds compose. Split gain maximizes
    S_L²/n_L + S_R²/n_R (the SSE-reduction identity); leaf values are
    truncating integer divisions S div (2n); each round's winning
    (dim, thr) is a 1-row TakeOrdered collect that parameterizes the
    next round's residuals as literals — the BPE/Bradley-Terry
    sanctioned driver-paced shape, deliberately NOT plan-unrolled
    (2^rounds plan copies). The oracle unrolls the same 3 rounds as
    scalar-subquery CTEs.

    Output: one row per round (dim, thr, leaf values, post-round
    training SSE) — the exact model a serving layer would replay.

    Scale: per round, one rows×dims×cuts map-side-combinable tally
    (the XGBoost approx-mode histogram shape) + two driver collects of
    1 row / 1 scalar. Headroom: Σr² e6 ints hold to ~9·10⁹ vectors.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.when(F.col("label") == 0, 1000).otherwise(0).cast("long")
        .alias("y"),
        F.transform(F.slice("embedding", 1, _GBDT_DIMS),
                    lambda x: F.round(x * 1000).cast("long")).alias("q"))
    rows = emb.select("vec_id", "y", F.posexplode("q").alias("dim", "val"))
    stats = rows.groupBy("dim").agg(F.min("val").alias("lo"),
                                    F.max("val").alias("hi"))
    cuts = (stats.select(
        "dim", F.explode(F.array(*[F.lit(t) for t in
                                   range(1, _GBDT_CUTS + 1)])).alias("t"),
        "lo", "hi")
        .select("dim", F.floor(F.col("lo") + (F.col("hi") - F.col("lo"))
                               * F.col("t") / (_GBDT_CUTS + 1))
                .cast("long").alias("thr")))
    pred = F.lit(0).cast("long")
    model = []
    for rnd in range(1, _GBDT_ROUNDS + 1):
        resid = emb.select("vec_id", "q", (F.col("y") - pred).alias("r"))
        tall = (resid.select("r", F.posexplode("q").alias("dim", "val"))
                .join(F.broadcast(cuts), "dim")
                .groupBy("dim", "thr")
                .agg(F.sum(F.when(F.col("val") <= F.col("thr"), 1)
                           .otherwise(0)).alias("n_l"),
                     F.sum(F.when(F.col("val") <= F.col("thr"), F.col("r"))
                           .otherwise(0)).alias("s_l"),
                     F.count(F.lit(1)).alias("n"),
                     F.sum("r").alias("s")))
        gain = ((F.col("s_l").cast("double") * F.col("s_l").cast("double")
                 * (F.col("n") - F.col("n_l")).cast("double")
                 + (F.col("s") - F.col("s_l")).cast("double")
                 * (F.col("s") - F.col("s_l")).cast("double")
                 * F.col("n_l").cast("double"))
                / (F.col("n_l") * (F.col("n") - F.col("n_l")))
                .cast("double"))
        best = (tall.where((F.col("n_l") > 0) & (F.col("n_l") < F.col("n")))
                .select("dim", "thr", "n_l", "s_l",
                        (F.col("n") - F.col("n_l")).alias("n_r"),
                        (F.col("s") - F.col("s_l")).alias("s_r"),
                        gain.alias("g"))
                .orderBy(F.desc("g"), F.asc("dim"), F.asc("thr"))
                .limit(1).collect()[0])   # 1-row driver-paced argmax

        def tdiv(a: int, b: int) -> int:
            q = abs(a) // b
            return q if a >= 0 else -q

        v_l = tdiv(best["s_l"], 2 * best["n_l"])
        v_r = tdiv(best["s_r"], 2 * best["n_r"])
        pred = pred + F.when(
            F.element_at(F.col("q"), best["dim"] + 1) <= best["thr"],
            F.lit(v_l)).otherwise(F.lit(v_r))
        sse = (emb.select(((F.col("y") - pred)
                           * (F.col("y") - pred)).alias("r2"))
               .agg(F.sum("r2")).collect()[0][0])   # 1-scalar collect
        model.append((rnd, int(best["dim"]), int(best["thr"]),
                      v_l, v_r, int(sse)))
    return spark.createDataFrame(
        model, "round int, dim int, thr long, leaf_l_e3 long,"
               " leaf_r_e3 long, sse_after_e6 long")


def _gbdt_sql() -> str:
    head = f"""
WITH emb AS (
  SELECT vec_id,
         CASE WHEN label = 0 THEN 1000 ELSE 0 END::BIGINT AS y,
         list_transform(embedding[1:{_GBDT_DIMS}],
                        x -> CAST(round(x * 1000) AS BIGINT)) AS q
  FROM embeddings
), rows_q AS (
  SELECT vec_id, y, u.dim, u.val
  FROM (SELECT vec_id, y,
               unnest(list_transform(range(1, {_GBDT_DIMS} + 1),
                   i -> struct_pack(dim := i - 1, val := q[i]))) AS u
        FROM emb)
), stats AS (
  SELECT dim, min(val) AS lo, max(val) AS hi FROM rows_q GROUP BY 1
), cuts AS (
  SELECT dim,
         CAST(floor(lo + (hi - lo) * t / {_GBDT_CUTS + 1}) AS BIGINT) AS thr
  FROM stats, unnest(range(1, {_GBDT_CUTS} + 1)) AS r(t)
)"""
    parts = [head]
    # resid0 = y
    parts.append(", resid1 AS (SELECT vec_id, q, y AS r FROM emb)")
    sdiv = ("(CASE WHEN {a} < 0 THEN -((-({a})) // ({b}))"
            " ELSE ({a}) // ({b}) END)")
    for t in range(1, _GBDT_ROUNDS + 1):
        parts.append(f"""
, tall{t} AS (
  SELECT c.dim, c.thr,
         CAST(sum(CASE WHEN rq.val <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_l,
         CAST(sum(CASE WHEN rq.val <= c.thr THEN rs.r ELSE 0 END)
              AS BIGINT) AS s_l,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rs.r) AS BIGINT) AS s
  FROM resid{t} rs
  JOIN rows_q rq ON rq.vec_id = rs.vec_id
  JOIN cuts c ON c.dim = rq.dim
  GROUP BY 1, 2
), best{t} AS (
  SELECT dim, thr, n_l, s_l, n - n_l AS n_r, s - s_l AS s_r,
         (CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)
              * CAST(n - n_l AS DOUBLE)
          + CAST(s - s_l AS DOUBLE) * CAST(s - s_l AS DOUBLE)
              * CAST(n_l AS DOUBLE))
         / CAST(n_l * (n - n_l) AS DOUBLE) AS g
  FROM tall{t}
  WHERE n_l > 0 AND n_l < n
  ORDER BY g DESC, dim ASC, thr ASC
  LIMIT 1
), leaf{t} AS (
  SELECT dim, thr,
         {sdiv.format(a='s_l', b='2 * n_l')} AS v_l,
         {sdiv.format(a='s_r', b='2 * n_r')} AS v_r,
         g
  FROM best{t}
), resid{t + 1} AS (
  SELECT rs.vec_id, rs.q,
         rs.r - (CASE WHEN rs.q[(SELECT dim FROM leaf{t}) + 1]
                          <= (SELECT thr FROM leaf{t})
                      THEN (SELECT v_l FROM leaf{t})
                      ELSE (SELECT v_r FROM leaf{t}) END) AS r
  FROM resid{t} rs
), sse{t} AS (
  SELECT CAST(sum(r * r) AS BIGINT) AS sse FROM resid{t + 1}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS round, CAST(l.dim AS INT) AS dim, l.thr,"
        f" l.v_l AS leaf_l_e3, l.v_r AS leaf_r_e3,"
        f" (SELECT sse FROM sse{t}) AS sse_after_e6 FROM leaf{t} l"
        for t in range(1, _GBDT_ROUNDS + 1))
    return "".join(parts) + "\n" + sel


QUERIES["gbdt_stump_rounds"] = (_gbdt_stump_rounds, _gbdt_sql())


# ---------------------------------------------------------------------------
# Youden-J optimal threshold from the score-run table
# ---------------------------------------------------------------------------

def _youden_j_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal operating point of the length→lang scorer by Youden's
    J = TPR − FPR, maximized over score-run thresholds ("predict
    positive when score ≥ thr"). The argmax key is the EXACT integer
    J·P·N = tp·N − fp·P (no double enters the comparison); ties break
    to the lowest threshold. Completes the ROC family: curve
    (``roc_curve_points``), area (``auc_mann_whitney``), PR area
    (``pr_auc_average_precision``), and now the operating point.

    Scale: the same one-aggregate + alphabet-bounded cumulative-window
    shape as the AUC twin, finished by a 1-row TakeOrdered.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"))
    runs = docs.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("score"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = runs.select(
        "score",
        F.sum("pos").over(w).alias("tp"),
        (F.sum("cnt").over(w) - F.sum("pos").over(w)).alias("fp"))
    tot = runs.agg(F.sum("pos").alias("p"),
                   (F.sum("cnt") - F.sum("pos")).alias("n"))
    j = (cum.crossJoin(F.broadcast(tot))
         .select("score", "tp", "fp", "p", "n",
                 (F.col("tp") * F.col("n") - F.col("fp") * F.col("p"))
                 .alias("j_pn")))
    return (j.orderBy(F.desc("j_pn"), F.asc("score")).limit(1)
            .select(F.col("score").alias("threshold"), "tp", "fp",
                    F.expr("(1000000 * j_pn) div (p * n)").alias("j_e6")))


_YOUDEN_SQL = """
WITH docs AS (
  SELECT CAST(n_chars AS BIGINT) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), runs AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM docs GROUP BY 1
), cum AS (
  SELECT score,
         CAST(sum(pos) OVER w AS BIGINT) AS tp,
         CAST(sum(cnt) OVER w - sum(pos) OVER w AS BIGINT) AS fp
  FROM runs
  WINDOW w AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS p,
         CAST(sum(cnt) - sum(pos) AS BIGINT) AS n
  FROM runs
)
SELECT score AS threshold, tp, fp,
       (1000000 * (tp * n - fp * p)) // (p * n) AS j_e6
FROM cum, tot
ORDER BY tp * n - fp * p DESC, score ASC
LIMIT 1
"""

QUERIES["youden_j_threshold"] = (_youden_j_threshold, _YOUDEN_SQL)


# ---------------------------------------------------------------------------
# Rocchio nearest-centroid classifier (confusion over the full corpus)
# ---------------------------------------------------------------------------

def _rocchio_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean (Rocchio) classification of every embedding
    against per-label centroids — the zero-hyperparameter baseline
    that tells a curation pipeline whether class structure is LINEAR
    in embedding space before it reaches for k-NN (``knn_classifier_
    eval``) or a trained head. Centroids are element-wise truncating
    integer means of the quantized vectors; distances are exact
    integer squared-L2; centroid ties break to the lowest label
    (struct-min — the argmax rule). Output: confusion matrix
    (true_label, pred_label, n) plus the diagonal flag.

    Scale: centroids are ONE map-side-combinable (label, dim)
    aggregate; assignment broadcasts the 10×64 centroid panel against
    the corpus scan — no corpus shuffle at all; the confusion rollup
    keys on a 10×10 alphabet.
    """
    from .clustering import DIM, _quantized, _sq_dist

    emb = load(spark, sf_dir, "embeddings")
    vecs = _quantized(emb).join(
        emb.select("vec_id", F.col("label").cast("long").alias("label")),
        "vec_id")
    dims = vecs.select(
        "label", F.posexplode("v").alias("dim", "x"))
    cents = (dims.groupBy("label", "dim")
             .agg(F.expr("sum(x)").alias("s"), F.count(F.lit(1)).alias("n"))
             .select("label", "dim",
                     F.expr("(case when s < 0 then -((-s) div n)"
                            " else s div n end)").alias("c"))
             .groupBy(F.col("label").alias("clabel"))
             .agg(F.expr("transform(array_sort(collect_list("
                         "struct(dim, c))), t -> t.c)").alias("cv")))
    scored = (vecs.join(F.broadcast(cents))
              .withColumn("d", _sq_dist(F.col("v"), F.col("cv"))))
    best = (scored.groupBy("vec_id", "label")
            .agg(F.min(F.struct("d", "clabel")).alias("m"))
            .select("label", F.col("m.clabel").alias("pred")))
    return (best.groupBy(F.col("label").alias("true_label"),
                         F.col("pred").alias("pred_label"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("correct",
                        (F.col("true_label") == F.col("pred_label"))
                        .cast("int")))


def _rocchio_sql() -> str:
    from .clustering import DIM, _QV

    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, {_QV} AS v
  FROM embeddings
), dims AS (
  SELECT label, u.dim, u.x
  FROM (SELECT label,
               unnest(list_transform(range(1, {DIM} + 1),
                   i -> struct_pack(dim := i - 1, x := v[i]))) AS u
        FROM vecs)
), cmeans AS (
  SELECT label, dim,
         (CASE WHEN CAST(sum(x) AS BIGINT) < 0
               THEN -((-CAST(sum(x) AS BIGINT)) // CAST(count(*) AS BIGINT))
               ELSE CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT)
          END) AS c
  FROM dims GROUP BY 1, 2
), cents AS (
  SELECT label AS clabel, list(c ORDER BY dim) AS cv
  FROM cmeans GROUP BY 1
), scored AS (
  SELECT a.vec_id, a.label, c.clabel,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, {DIM} + 1),
                 i -> (a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i]))),
             (x, y) -> x + y) AS d
  FROM vecs a CROSS JOIN cents c
), best AS (
  SELECT label, min(struct_pack(d := d, clabel := clabel)).clabel AS pred
  FROM scored GROUP BY vec_id, label
)
SELECT label AS true_label, pred AS pred_label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN label = pred THEN 1 ELSE 0 END AS INT) AS correct
FROM best GROUP BY 1, 2
"""


QUERIES["rocchio_centroid_eval"] = (_rocchio_centroid_eval, _rocchio_sql())


# ---------------------------------------------------------------------------
# Cumulative gains / lift chart at 10 population deciles
# ---------------------------------------------------------------------------

def _gains_chart_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift of the length→lang scorer at 10
    population deciles: "contacting the top d/10 of documents by score
    captures what share of the positives, at what lift over random" —
    the business-facing readout of the same run table the
    ROC/PR/Youden family audits. Decile points select the first
    score-run crossing d·N/10 via struct-min (exact integers); gain
    and lift divide exact ints per output row.

    Scale: the one-aggregate + alphabet-bounded cumulative-window
    shape of the AUC twin, finished by a 10-row readout.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"))
    runs = docs.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("score"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = runs.select(
        "score",
        F.sum("cnt").over(w).alias("cumn"),
        F.sum("pos").over(w).alias("cumpos"))
    tot = runs.agg(F.sum("cnt").alias("n"), F.sum("pos").alias("p"))
    dec = (cum.crossJoin(F.broadcast(tot))
           .select("*", F.explode(F.sequence(F.lit(1), F.lit(10)))
                   .alias("decile"))
           .where(10 * F.col("cumn") >= F.col("decile") * F.col("n"))
           .groupBy("decile")
           .agg(F.min(F.struct("cumn", "score", "cumpos", "n", "p"))
                .alias("m")))
    return dec.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("m.cumn").alias("cum_docs"),
        F.col("m.cumpos").alias("cum_pos"),
        F.expr("(1000000 * m.cumpos) div m.p").alias("gain_e6"),
        F.expr("(1000000 * m.cumpos * m.n) div (m.p * m.cumn)")
        .alias("lift_e6"))


_GAINS_SQL = """
WITH docs AS (
  SELECT CAST(n_chars AS BIGINT) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), runs AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM docs GROUP BY 1
), cum AS (
  SELECT score,
         CAST(sum(cnt) OVER w AS BIGINT) AS cumn,
         CAST(sum(pos) OVER w AS BIGINT) AS cumpos
  FROM runs
  WINDOW w AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
  FROM runs
), dec AS (
  SELECT d.decile,
         min(struct_pack(cumn := c.cumn, score := c.score,
                         cumpos := c.cumpos, n := t.n, p := t.p)) AS m
  FROM cum c CROSS JOIN tot t
  CROSS JOIN unnest(range(1, 11)) AS d(decile)
  WHERE 10 * c.cumn >= d.decile * t.n
  GROUP BY d.decile
)
SELECT CAST(decile AS INT) AS decile,
       m.cumn AS cum_docs, m.cumpos AS cum_pos,
       (1000000 * m.cumpos) // m.p AS gain_e6,
       (1000000 * m.cumpos * m.n) // (m.p * m.cumn) AS lift_e6
FROM dec
"""

QUERIES["gains_chart_deciles"] = (_gains_chart_deciles, _GAINS_SQL)


# ---------------------------------------------------------------------------
# 5-fold cross-validated decision stump (leave-fold-out, no driver loop)
# ---------------------------------------------------------------------------
_SCV_FOLDS = 5


def _stump_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the histogram decision stump on
    "is this vector label 0": per (fold, dim, thr) class tallies are
    ONE map-side aggregate, each fold's TRAINING tallies are
    total − fold (no second scan, no driver loop — the leave-one-out
    algebra), the winning split per fold is a struct-min argmax
    (purity desc, dim, thr), leaf classes are integer majority votes,
    and test accuracy reads the held-out fold's tallies at the chosen
    split. The honest-evaluation counterpart of
    ``decision_stump_split_search`` (train metrics) and
    ``gbdt_stump_rounds`` (train SSE).

    Scale: rows × dims × cuts × 1 tally pass (map-side combinable),
    then everything lives on the (folds × dims × cuts)-bounded grid.
    Purity compares as a double from exact int64 counts inside the
    struct-min — identical in both engines.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % _SCV_FOLDS).alias("fold"),
        F.when(F.col("label") == 0, 1).otherwise(0).cast("long")
        .alias("y"),
        F.transform(F.slice("embedding", 1, _GBDT_DIMS),
                    lambda x: F.round(x * 1000).cast("long")).alias("q"))
    rows = emb.select("fold", "y",
                      F.posexplode("q").alias("dim", "val"))
    stats = rows.groupBy("dim").agg(F.min("val").alias("lo"),
                                    F.max("val").alias("hi"))
    cuts = (stats.select(
        "dim", F.explode(F.array(*[F.lit(t) for t in
                                   range(1, _GBDT_CUTS + 1)])).alias("t"),
        "lo", "hi")
        .select("dim", F.floor(F.col("lo") + (F.col("hi") - F.col("lo"))
                               * F.col("t") / (_GBDT_CUTS + 1))
                .cast("long").alias("thr")))
    tal = (rows.join(F.broadcast(cuts), "dim")
           .groupBy("fold", "dim", "thr")
           .agg(F.sum(F.when(F.col("val") <= F.col("thr"), 1)
                      .otherwise(0)).alias("n_l"),
                F.sum(F.when(F.col("val") <= F.col("thr"), F.col("y"))
                      .otherwise(0)).alias("p_l"),
                F.count(F.lit(1)).alias("n"),
                F.sum("y").alias("p")))
    tot = (tal.groupBy("dim", "thr")
           .agg(F.sum("n_l").alias("tn_l"), F.sum("p_l").alias("tp_l"),
                F.sum("n").alias("tn"), F.sum("p").alias("tp")))
    # training tallies per fold = totals minus the held-out fold
    tr = (tal.join(tot, ["dim", "thr"])
          .select("fold", "dim", "thr", "n_l", "p_l", "n", "p",
                  (F.col("tn_l") - F.col("n_l")).alias("a_nl"),
                  (F.col("tp_l") - F.col("p_l")).alias("a_pl"),
                  (F.col("tn") - F.col("n")).alias("a_n"),
                  (F.col("tp") - F.col("p")).alias("a_p")))
    nl, pl = F.col("a_nl"), F.col("a_pl")
    nr = F.col("a_n") - nl
    pr = F.col("a_p") - pl
    sl2 = pl * pl + (nl - pl) * (nl - pl)
    sr2 = pr * pr + (nr - pr) * (nr - pr)
    purity = ((sl2 * nr + sr2 * nl).cast("double")
              / (nl * nr).cast("double"))
    best = (tr.where((nl > 0) & (nr > 0))
            .groupBy("fold")
            .agg(F.min(F.struct((-purity).alias("np"),
                                F.col("dim").alias("dim"),
                                F.col("thr").alias("thr"),
                                # leaf majorities from TRAIN tallies
                                F.when(2 * pl > nl, 1).otherwise(0)
                                .alias("cl"),
                                F.when(2 * pr > nr, 1).otherwise(0)
                                .alias("cr"))).alias("b")))
    ev = (best.select("fold", "b.dim", "b.thr", "b.cl", "b.cr")
          .join(tal, ["fold", "dim", "thr"]))
    correct = (F.when(F.col("cl") == 1, F.col("p_l"))
               .otherwise(F.col("n_l") - F.col("p_l"))
               + F.when(F.col("cr") == 1, F.col("p") - F.col("p_l"))
               .otherwise((F.col("n") - F.col("n_l"))
                          - (F.col("p") - F.col("p_l"))))
    return (ev.select(
        F.col("fold").cast("int").alias("fold"),
        F.col("dim").cast("int").alias("dim"), "thr",
        correct.alias("test_correct"), F.col("n").alias("test_n"))
        .select("fold", "dim", "thr", "test_correct", "test_n",
                F.expr("(1000000 * test_correct) div test_n")
                .alias("acc_e6")))


def _stump_cv_sql() -> str:
    return f"""
WITH emb AS (
  SELECT vec_id % {_SCV_FOLDS} AS fold,
         CASE WHEN label = 0 THEN 1 ELSE 0 END::BIGINT AS y,
         list_transform(embedding[1:{_GBDT_DIMS}],
                        x -> CAST(round(x * 1000) AS BIGINT)) AS q
  FROM embeddings
), rows_q AS (
  SELECT fold, y, u.dim, u.val
  FROM (SELECT fold, y,
               unnest(list_transform(range(1, {_GBDT_DIMS} + 1),
                   i -> struct_pack(dim := i - 1, val := q[i]))) AS u
        FROM emb)
), stats AS (
  SELECT dim, min(val) AS lo, max(val) AS hi FROM rows_q GROUP BY 1
), cuts AS (
  SELECT dim,
         CAST(floor(lo + (hi - lo) * t / {_GBDT_CUTS + 1}) AS BIGINT) AS thr
  FROM stats, unnest(range(1, {_GBDT_CUTS} + 1)) AS r(t)
), tal AS (
  SELECT r.fold, r.dim, c.thr,
         CAST(sum(CASE WHEN r.val <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_l,
         CAST(sum(CASE WHEN r.val <= c.thr THEN r.y ELSE 0 END) AS BIGINT)
             AS p_l,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r.y) AS BIGINT) AS p
  FROM rows_q r JOIN cuts c ON r.dim = c.dim
  GROUP BY 1, 2, 3
), tot AS (
  SELECT dim, thr, CAST(sum(n_l) AS BIGINT) AS tn_l,
         CAST(sum(p_l) AS BIGINT) AS tp_l,
         CAST(sum(n) AS BIGINT) AS tn, CAST(sum(p) AS BIGINT) AS tp
  FROM tal GROUP BY 1, 2
), tr AS (
  SELECT t.fold, t.dim, t.thr, t.n_l, t.p_l, t.n, t.p,
         o.tn_l - t.n_l AS a_nl, o.tp_l - t.p_l AS a_pl,
         o.tn - t.n AS a_n, o.tp - t.p AS a_p
  FROM tal t JOIN tot o ON t.dim = o.dim AND t.thr = o.thr
), best AS (
  SELECT fold,
         min(struct_pack(
             np := -(CAST((a_pl * a_pl + (a_nl - a_pl) * (a_nl - a_pl))
                          * (a_n - a_nl)
                          + ((a_p - a_pl) * (a_p - a_pl)
                             + ((a_n - a_nl) - (a_p - a_pl))
                               * ((a_n - a_nl) - (a_p - a_pl)))
                            * a_nl AS DOUBLE)
                     / CAST(a_nl * (a_n - a_nl) AS DOUBLE)),
             dim := dim, thr := thr,
             cl := CASE WHEN 2 * a_pl > a_nl THEN 1 ELSE 0 END,
             cr := CASE WHEN 2 * (a_p - a_pl) > (a_n - a_nl)
                        THEN 1 ELSE 0 END)) AS b
  FROM tr
  WHERE a_nl > 0 AND a_n - a_nl > 0
  GROUP BY fold
), ev AS (
  SELECT b.fold, b.b.dim AS dim, b.b.thr AS thr, b.b.cl AS cl,
         b.b.cr AS cr, t.n_l, t.p_l, t.n, t.p
  FROM best b JOIN tal t
    ON b.fold = t.fold AND b.b.dim = t.dim AND b.b.thr = t.thr
)
SELECT CAST(fold AS INT) AS fold, CAST(dim AS INT) AS dim, thr,
       (CASE WHEN cl = 1 THEN p_l ELSE n_l - p_l END
        + CASE WHEN cr = 1 THEN p - p_l
               ELSE (n - n_l) - (p - p_l) END) AS test_correct,
       n AS test_n,
       (1000000 * (CASE WHEN cl = 1 THEN p_l ELSE n_l - p_l END
                   + CASE WHEN cr = 1 THEN p - p_l
                          ELSE (n - n_l) - (p - p_l) END)) // n AS acc_e6
FROM ev
"""


QUERIES["stump_cv_accuracy"] = (_stump_cv_accuracy, _stump_cv_sql())
