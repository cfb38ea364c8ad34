"""Statistical language-model operators over the documents corpus.

The model-based half of a curation stack (the counting/heuristic half
lives in ``functions/text*.py`` and ``plans/corpus_queries.py``):

- ``ngram_lm_perplexity`` — train a bigram LM on the corpus and score
  every document's smoothed cross-entropy / perplexity. This is the
  CCNet-style quality signal: documents whose word sequences are
  improbable under a corpus-level n-gram model are gibberish or
  boilerplate, and a curation pipeline buckets or drops them by this
  score.
- ``bpe_encode_docs`` — apply a trained BPE merge list (the K-round
  trainer in ``plans/corpus_queries.bpe_train_merges``) to every
  document and report token counts before/after: the "tokenize the
  corpus with the learned vocabulary" pass that sizes a training run.

Both are pure Column-expression plans (whole-stage codegen, no UDFs)
with DuckDB oracles; scale notes on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..tables import load

# Laplace add-one smoothing over the observed vocabulary: an unseen
# continuation of word a scores 1 / (c(a) + V). Constant chosen over
# interpolation because it is exactly reproducible in integer-ratio
# space (both engines compute (cb+1)/(cu+V) as a single BIGINT/BIGINT
# double division — bit-identical inputs to ln()).


def ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram cross-entropy under a corpus-trained LM.

    Train: unigram counts c(a), bigram counts c(a,b), vocabulary size V
    — two map-side-combined aggregations over one corpus scan. Score:
    for each adjacent pair (a,b) in a document,
    ``lp = ln((c(a,b) + 1) / (c(a) + V))`` (add-one smoothing), and the
    document's cross-entropy is ``-avg(lp)`` in nats; perplexity is its
    exp.

    Scale: the model tables are Heaps'-law bounded (vocab ~ sqrt of
    corpus tokens; bigram types grow sublinearly too) — far smaller
    than the corpus — and the score join runs on fixed-width
    ``unhex(md5(..))`` keys (16 bytes) rather than word strings, so the
    Zipf head ("the") hashes to the same few bytes instead of shipping
    text; AQE handles the residual key skew with skew-join splitting.
    The unigram denominator is folded INTO the bigram model at build
    time (a vocab-sized join — each bigram key functionally determines
    its first word), so the corpus-sized probe is ONE join against one
    model table, not two. Nothing collects to the driver; V rides a
    broadcast one-row frame.

    Float determinism: the per-pair ln() inputs are integer-ratio
    doubles (bit-identical cross-engine); the per-doc sum is
    order-sensitive only below ~1e-12 relative, 8 decimal digits under
    the round(·, 4) contract.
    """
    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", tokens(F.lower(F.col("text"))).alias("w"))

    uni = (docs.select(F.explode("w").alias("tok"))
           .groupBy(F.unhex(F.md5("tok")).alias("uk"))
           .agg(F.count(F.lit(1)).alias("uc")))
    vstats = uni.agg(F.count(F.lit(1)).alias("v_size"))

    idx = F.when(F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    pairs = (docs
             .select("doc_id", F.explode(F.transform(idx, lambda i: F.struct(
                 F.element_at(F.col("w"), i).alias("a"),
                 F.element_at(F.col("w"), i + 1).alias("b")))).alias("p"))
             .select("doc_id",
                     F.unhex(F.md5("p.a")).alias("uk"),
                     F.unhex(F.md5(F.concat_ws("\x1f", "p.a", "p.b")))
                      .alias("bk")))
    # model build: bigram counts, then the vocab-sized denominator join
    # (uk is functionally dependent on bk, so it rides the groupBy key)
    model = (pairs.groupBy("bk", "uk")
             .agg(F.count(F.lit(1)).alias("bc"))
             .join(uni, "uk")
             .select("bk", "bc", "uc"))

    scored = (pairs.drop("uk")
              .join(model, "bk")
              .crossJoin(F.broadcast(vstats))
              .select("doc_id",
                      F.log((F.col("bc") + 1) / (F.col("uc") + F.col("v_size")))
                       .alias("lp")))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("slp"))
    base = load(spark, sf_dir, "documents").select("doc_id")
    ce = -F.col("slp") / F.col("n_bigrams")
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(ce, 4).alias("cross_entropy"),
        F.round(F.exp(ce), 4).alias("perplexity"))


_LM_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
uni AS (
    SELECT tok, count(*) AS uc
    FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok
),
vocab AS (SELECT count(*) AS v_size FROM uni),
pos AS (
    SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
    FROM toks
),
pairs AS (SELECT doc_id, w[i] AS a, w[i + 1] AS b FROM pos),
big AS (SELECT a, b, count(*) AS bc FROM pairs GROUP BY a, b),
scored AS (
    SELECT p.doc_id, ln((bg.bc + 1) / (u.uc + v.v_size)) AS lp
    FROM pairs p
    JOIN uni u ON p.a = u.tok
    JOIN big bg ON p.a = bg.a AND p.b = bg.b
    CROSS JOIN vocab v
),
per_doc AS (
    SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(-p.slp / p.n_bigrams, 4) AS cross_entropy,
       round(exp(-p.slp / p.n_bigrams), 4) AS perplexity
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


ZIPF_TOP = 100


def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary rank-frequency diagnostics: the log-log OLS fit of
    the top-``ZIPF_TOP`` term frequencies against their ranks. Natural
    corpora sit near slope −1 (Zipf's law); a corpus whose slope is far
    off is template spam (too flat: every doc the same words) or noise
    (too steep: no shared vocabulary) — a one-row corpus health gate a
    curation run can assert on.

    Scale: term counts are one map-side-combined aggregation; the
    top-K is orderBy+limit (TakeOrdered — per-partition heaps, no
    global sort), and ranking + regression run on the K-row result
    (single tiny partition by construction). The corpus never shuffles
    more than (term, count) pairs.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
          .where(F.col("t") != "")
          .groupBy("t").agg(F.count(F.lit(1)).alias("cnt")))
    top = tf.orderBy(F.desc("cnt"), F.asc("t")).limit(ZIPF_TOP)
    w = Window.orderBy(F.desc("cnt"), F.asc("t"))
    pts = top.select(F.log(F.row_number().over(w).cast("double")).alias("x"),
                     F.log(F.col("cnt").cast("double")).alias("y"))
    agg = pts.agg(F.count(F.lit(1)).cast("double").alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"),
                  F.sum(F.col("y") * F.col("y")).alias("syy"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    r_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r_den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                   * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")))
    return agg.select(
        F.col("n").cast("int").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4)
         .alias("intercept"),
        F.round((r_num / r_den) * (r_num / r_den), 4).alias("r2"))


_ZIPF_SQL = rf"""
WITH tf AS (
    SELECT t, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
          FROM documents)
    WHERE t <> '' GROUP BY t
),
top AS (SELECT t, cnt FROM tf ORDER BY cnt DESC, t ASC LIMIT {ZIPF_TOP}),
pts AS (
    SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, t ASC) AS DOUBLE))
               AS x,
           ln(CAST(cnt AS DOUBLE)) AS y
    FROM top
),
agg AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM pts
)
SELECT CAST(n AS INT) AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
           AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
FROM agg
"""


QUERIES = {
    "ngram_lm_perplexity": (ngram_lm_perplexity, _LM_SQL),
    "token_zipf_fit": (token_zipf_fit, _ZIPF_SQL),
}
