"""Round-7 IR / tokenizer-analytics / recommendation-quality queries.

Extends the retrieval stack (tfidf/bm25/maxsim/QL…) and the
training-data tokenizer audits with the measurements a 100 TB corpus +
serving pipeline runs routinely:

- ``chrf_pair_eval``          — chrF-style character-3-gram F-score
  between curation pairs (the MT/gen-eval metric family next to the
  existing ROUGE/BLEU twins).
- ``ql_dirichlet_retrieval``  — query-likelihood ranking with Dirichlet
  smoothing (the LM retrieval model; BM25's probabilistic sibling).
- ``impact_sparse_retrieval`` — learned-sparse serving shape: integer
  quantized term impacts summed per doc (SPLADE/DeepImpact-style
  scoring without the model — impacts derive from tf × an idf bucket).
- ``tokenizer_fertility_by_lang`` — subword-per-word fertility by
  language, the tokenizer-health metric multilingual corpora track.
- ``char_coverage_audit``     — SentencePiece-style character-coverage
  curve: how many distinct characters cover 90/99/99.9/99.95% of the
  corpus.
- ``byte_fallback_rate``      — share of characters outside the core
  [a-z0-9 ] vocabulary per (lang, source): the byte-fallback pressure
  a tokenizer would face.
- ``speculative_accept_rate`` — bigram-draft speculative-decoding
  acceptance rate by position bucket (the serving-side metric for
  draft-model choice), measured corpus-wide.
- ``intra_list_diversity``    — recommendation ILD over co-order rec
  lists (brand/type disagreement among list pairs).
- ``catalog_coverage_bias``   — catalog coverage + top-decile exposure
  concentration of those lists (popularity-bias audit).

Every query carries a DuckDB oracle; determinism follows CLAUDE.md
(md5 shuffle keys for text, integer e6 fixed-point, struct-min
argmax, run-table windows only on bounded-cardinality frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from ..functions.text import (BPE_PRETOKEN_RE, bpe_pretokens,
                              bpe_token_estimate)

QUERIES: dict = {}


# --------------------------------------------------------------------------
# chrf_pair_eval: character-3-gram F-score between curation pairs
# --------------------------------------------------------------------------
CHRF_N = 3


def _chrf_pair_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF-lite between each doc and its same-source successor (the
    pairing heuristic the ROUGE/BLEU eval twins use): clipped
    character-3-gram overlap, F1 = 2·o/(ta+tb) in e6 fixed point —
    integer-exact because with P=o/tb, R=o/ta the harmonic mean
    reduces to 2o/(ta+tb).

    Scale: one explode of char 3-grams per doc (n_chars rows), counts
    keyed by 16-byte unhex(md5(gram)) (CLAUDE.md text-key rule) and
    map-side combined to per-doc alphabet size; the pair join is
    id-keyed. No floats anywhere.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    pairs = (docs
             .select("doc_id", F.lead("doc_id").over(wsrc).alias("ref_id"))
             .where(F.col("ref_id").isNotNull()))
    grams = docs.select(
        "doc_id",
        F.explode(F.when(
            F.length("text") >= CHRF_N,
            F.expr(f"transform(sequence(1, length(text) - {CHRF_N - 1}),"
                   f" i -> substr(text, i, {CHRF_N}))"))
            .otherwise(F.array().cast("array<string>"))).alias("g"))
    counts = (grams
              .select("doc_id", F.unhex(F.md5("g")).alias("gk"))
              .groupBy("doc_id", "gk")
              .agg(F.count(F.lit(1)).alias("c")))
    ca = counts.select(F.col("doc_id").alias("a_id"), "gk",
                       F.col("c").alias("c_a"))
    cb = counts.select(F.col("doc_id").alias("ref_id"), "gk",
                       F.col("c").alias("c_b"))
    ov = (pairs.join(ca, pairs["doc_id"] == ca["a_id"])
          .join(cb, ["ref_id", "gk"])
          .groupBy("doc_id", "ref_id")
          .agg(F.sum(F.least("c_a", "c_b")).alias("overlap")))
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("t"))
    return (pairs
            .join(tot.withColumnRenamed("doc_id", "a_id")
                  .withColumnRenamed("t", "ta"),
                  pairs["doc_id"] == F.col("a_id"))
            .join(tot.select(F.col("doc_id").alias("ref_id"),
                             F.col("t").alias("tb")), "ref_id")
            .join(ov, ["doc_id", "ref_id"], "left")
            .select("doc_id", "ref_id",
                    F.col("ta").cast("long").alias("n_grams_hyp"),
                    F.col("tb").cast("long").alias("n_grams_ref"),
                    F.coalesce("overlap", F.lit(0)).cast("long")
                    .alias("overlap"),
                    F.expr("2000000 * coalesce(overlap, 0)"
                           " div (ta + tb)").alias("chrf_e6")))


_CHRF_SQL = rf"""
WITH pairs AS (
    SELECT doc_id, lead(doc_id) OVER (PARTITION BY source
                                      ORDER BY doc_id) AS ref_id
    FROM documents
),
pairs_ne AS (SELECT * FROM pairs WHERE ref_id IS NOT NULL),
grams AS (
    SELECT doc_id,
           unhex(md5(g)) AS gk
    FROM (
        SELECT doc_id,
               unnest(CASE WHEN length(text) >= {CHRF_N}
                      THEN list_transform(
                          range(1, length(text) - {CHRF_N - 1} + 1),
                          i -> substr(text, i, {CHRF_N}))
                      ELSE [] END) AS g
        FROM documents)
),
counts AS (
    SELECT doc_id, gk, CAST(count(*) AS BIGINT) AS c
    FROM grams GROUP BY doc_id, gk
),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY 1),
ov AS (
    SELECT p.doc_id, p.ref_id,
           CAST(sum(least(a.c, b.c)) AS BIGINT) AS overlap
    FROM pairs_ne p
    JOIN counts a ON a.doc_id = p.doc_id
    JOIN counts b ON b.doc_id = p.ref_id AND b.gk = a.gk
    GROUP BY 1, 2
)
SELECT p.doc_id, p.ref_id,
       ta.t AS n_grams_hyp, tb.t AS n_grams_ref,
       coalesce(o.overlap, 0) AS overlap,
       2000000 * coalesce(o.overlap, 0) // (ta.t + tb.t) AS chrf_e6
FROM pairs_ne p
JOIN tot ta ON ta.doc_id = p.doc_id
JOIN tot tb ON tb.doc_id = p.ref_id
LEFT JOIN ov o ON o.doc_id = p.doc_id AND o.ref_id = p.ref_id
"""

QUERIES["chrf_pair_eval"] = (_chrf_pair_eval, _CHRF_SQL)


# --------------------------------------------------------------------------
# tokenizer_fertility_by_lang: subwords-per-word by language
# --------------------------------------------------------------------------
def _tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) by
    language — the metric multilingual-corpus teams watch because
    high-fertility languages pay more compute per word and starve in a
    token-budgeted mix. Subword counts use the repo's vocabulary-free
    BPE estimate (functions/text.bpe_token_estimate's rule: each
    pre-token costs max(1, ceil(len/4))).

    Scale: pure scan-fused column expressions per doc, one map-side
    combined aggregation to |langs| rows. Integer sums; fertility is
    an exact e6 integer division.
    """
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    # Python-API helpers, NOT F.expr: a SQL string literal would eat
    # the regex's \s (functions/text.py ships the pattern via F.lit).
    pre = bpe_pretokens(F.col("text"))
    subwords = bpe_token_estimate(F.col("text"))
    words = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    per = docs.select("lang", subwords.alias("n_sub"),
                      words.alias("n_words"),
                      F.size(pre).cast("long").alias("n_pretokens"))
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_sub").alias("n_subwords"),
                 F.sum("n_words").alias("n_words"),
                 F.sum("n_pretokens").alias("n_pretokens"))
            .select("lang", "n_docs", "n_subwords", "n_words",
                    "n_pretokens",
                    F.expr("1000000 * n_subwords div n_words")
                    .alias("fertility_e6"),
                    F.expr("1000000 * n_subwords div n_pretokens")
                    .alias("pieces_per_pretoken_e6")))


_FERTILITY_SQL = rf"""
WITH per AS (
    SELECT lang,
           list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
               regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}', 0),
               t -> greatest(CAST(1 AS BIGINT),
                             CAST(ceil(length(t) / 4.0) AS BIGINT)))),
               (a, x) -> a + x) AS n_sub,
           CAST(len(regexp_split_to_array(trim(text), '\s+'))
                AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}',
                                       0)) AS BIGINT) AS n_pretokens
    FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_pretokens) AS BIGINT) AS n_pretokens,
       1000000 * CAST(sum(n_sub) AS BIGINT)
           // CAST(sum(n_words) AS BIGINT) AS fertility_e6,
       1000000 * CAST(sum(n_sub) AS BIGINT)
           // CAST(sum(n_pretokens) AS BIGINT) AS pieces_per_pretoken_e6
FROM per GROUP BY lang
"""

QUERIES["tokenizer_fertility_by_lang"] = (_tokenizer_fertility,
                                          _FERTILITY_SQL)


# --------------------------------------------------------------------------
# byte_fallback_rate: out-of-core-vocabulary character pressure
# --------------------------------------------------------------------------
def _byte_fallback_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of characters outside the core [a-z0-9 ] vocabulary per
    (lang, source) — the byte-fallback pressure a tokenizer with a
    letters+digits+space core would face on this slice (punctuation,
    casing handled by the lower() fold, anything non-ASCII). High rates
    flag slices that will fragment into byte tokens.

    Scale: scan-fused length arithmetic per row (no explode — fallback
    count is length(text) - length(kept)), one map-side combined
    aggregation to |lang × source| rows.
    """
    docs = load(spark, sf_dir, "documents").select("lang", "source", "text")
    low = F.lower(F.col("text"))
    n_chars = F.length(low).cast("long")
    n_kept = F.length(F.regexp_replace(low, "[^a-z0-9 ]", "")).cast("long")
    per = docs.select("lang", "source", n_chars.alias("nc"),
                      (n_chars - n_kept).alias("nf"))
    return (per.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nc").alias("n_chars"),
                 F.sum("nf").alias("n_fallback"))
            .select("lang", "source", "n_docs", "n_chars", "n_fallback",
                    F.expr("1000000 * n_fallback div n_chars")
                    .alias("fallback_e6")))


_FALLBACK_SQL = """
WITH per AS (
    SELECT lang, source,
           CAST(length(lower(text)) AS BIGINT) AS nc,
           CAST(length(lower(text))
                - length(regexp_replace(lower(text), '[^a-z0-9 ]', '',
                                        'g')) AS BIGINT) AS nf
    FROM documents
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(nf) AS BIGINT) AS n_fallback,
       1000000 * CAST(sum(nf) AS BIGINT) // CAST(sum(nc) AS BIGINT)
           AS fallback_e6
FROM per GROUP BY lang, source
"""

QUERIES["byte_fallback_rate"] = (_byte_fallback_rate, _FALLBACK_SQL)


# --------------------------------------------------------------------------
# char_coverage_audit: SentencePiece character-coverage curve
# --------------------------------------------------------------------------
_COVERAGE_POINTS = (900_000, 990_000, 999_000, 999_500)  # e6 thresholds


def _char_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style character coverage: rank corpus characters
    by frequency and report, for each coverage point (90/99/99.9/
    99.95%), how many distinct characters are needed and the exact
    coverage they achieve — the number that decides a tokenizer's
    `character_coverage` and alphabet size.

    Scale: the per-char explode is map-side combined to alphabet
    cardinality (~dozens of symbols) per partition before the one tiny
    shuffle; the cumulative-coverage window runs on that alphabet-
    cardinality run table (bounded, the quantile_normalize contract),
    never on the corpus. Int64 headroom: the threshold compare
    multiplies cum·1e6, exact up to ~9e12 total characters; past that
    (100 TB of raw text) both engines switch the compare to
    DECIMAL(38) with identical semantics.
    """
    docs = load(spark, sf_dir, "documents").select("text")
    chars = (docs.select(F.explode(F.split("text", "")).alias("ch"))
             .where(F.col("ch") != ""))
    counts = chars.groupBy("ch").agg(F.count(F.lit(1)).alias("c"))
    wcum = (Window.orderBy(F.desc("c"), F.asc("ch"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    ranked = counts.select(
        "ch", "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("ch")))
        .alias("rk"),
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("tot"))
    pts = F.explode(F.array(*[F.lit(p) for p in _COVERAGE_POINTS])) \
        .alias("cov_point_e6")
    hit = (ranked.select("rk", "cum", "tot", pts)
           .where(F.col("cum") * 1_000_000 >= F.col("cov_point_e6")
                  * F.col("tot"))
           .groupBy("cov_point_e6")
           .agg(F.min(F.struct(F.col("rk").alias("rk"),
                               F.col("cum").alias("cum"),
                               F.col("tot").alias("tot"))).alias("b")))
    return (hit.select(
        "cov_point_e6",
        F.col("b.rk").cast("long").alias("chars_needed"),
        F.expr("1000000 * b.cum div b.tot").alias("coverage_e6"),
        F.col("b.tot").cast("long").alias("n_chars_total")))


_CHAR_COVERAGE_SQL = f"""
WITH chars AS (
    SELECT unnest(list_transform(range(1, length(text) + 1),
                                 i -> text[i])) AS ch
    FROM documents
),
counts AS (SELECT ch, CAST(count(*) AS BIGINT) AS c
           FROM chars GROUP BY ch),
ranked AS (
    SELECT ch, c,
           CAST(row_number() OVER (ORDER BY c DESC, ch ASC) AS INT)
               AS rk,
           CAST(sum(c) OVER (ORDER BY c DESC, ch ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(sum(c) OVER () AS BIGINT) AS tot
    FROM counts
),
pts AS (SELECT unnest([{", ".join(str(p) for p in _COVERAGE_POINTS)}])
        AS cov_point_e6),
hit AS (
    SELECT p.cov_point_e6,
           (min(struct_pack(rk := r.rk, cum := r.cum, tot := r.tot))) AS b
    FROM pts p
    JOIN ranked r ON r.cum * 1000000 >= p.cov_point_e6 * r.tot
    GROUP BY 1
)
SELECT cov_point_e6,
       CAST(b.rk AS BIGINT) AS chars_needed,
       1000000 * b.cum // b.tot AS coverage_e6,
       b.tot AS n_chars_total
FROM hit
"""

QUERIES["char_coverage_audit"] = (_char_coverage_audit, _CHAR_COVERAGE_SQL)

# --------------------------------------------------------------------------
# ql_dirichlet_retrieval: query-likelihood LM ranking (Dirichlet smoothing)
# --------------------------------------------------------------------------
QL_MU = 300
QL_TERMS = ("table", "sort", "hash")
QL_TOPK = 20


def _ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing — the LM
    ranking model (Ponte/Croft, Zhai/Lafferty) that sits beside the
    existing BM25 twin: score(q,d) = Σ_t ln((tf_td + μ·cf_t/|C|) /
    (dl_d + μ)). Every doc scores every query term (smoothing gives
    absent terms mass), so the scored frame is |docs|·|Q| rows built
    from a BROADCAST of the |Q|-row term stats — never a corpus
    self-join.

    Determinism: follows the bm25_topk convention — tf/cf/dl/|C| are
    exact int64; the ln is the only float and the summed score rounds
    to 4 decimals before ranking in BOTH engines (the ln argument is
    a ratio of exact integers, identical cross-engine). Final top-k is
    TakeOrdered (per-partition heap), not a global sort.

    Scale: the term filter lands in the scan's explode, so only |Q|
    posting rows per doc shuffle; cf and |C| are |Q|-row / 1-row
    broadcast aggregates.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    .alias("w")))
    lens = docs.select("doc_id", F.size("w").cast("long").alias("dl"))
    tf = (docs.select("doc_id", F.explode("w").alias("term"))
          .where(F.col("term").isin(*QL_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf")))
    cf = tf.groupBy("term").agg(F.sum("n_tf").alias("cf"))
    csize = lens.agg(F.sum("dl").alias("c_total"))
    terms = (cf.crossJoin(F.broadcast(csize)))
    combo = lens.crossJoin(F.broadcast(terms))
    scored = (combo
              .join(tf, ["doc_id", "term"], "left")
              .select("doc_id", "dl",
                      F.coalesce("n_tf", F.lit(0)).alias("n_tf"),
                      "cf", "c_total")
              .groupBy("doc_id")
              .agg(F.sum((F.col("n_tf") > 0).cast("long"))
                   .alias("n_terms_matched"),
                   F.round(F.sum(
                       F.log((F.col("n_tf")
                              + F.lit(QL_MU) * F.col("cf")
                              / F.col("c_total"))
                             / (F.col("dl") + F.lit(QL_MU)))), 4)
                   .alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(QL_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select("doc_id", "n_terms_matched", "score",
                      F.row_number().over(w).alias("rank"))


_QL_SQL = rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM docs),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n_tf
    FROM (SELECT doc_id, unnest(w) AS term FROM docs)
    WHERE term IN ({", ".join(repr(t) for t in QL_TERMS)})
    GROUP BY 1, 2
),
cf AS (SELECT term, CAST(sum(n_tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
csize AS (SELECT CAST(sum(dl) AS BIGINT) AS c_total FROM lens),
combo AS (
    SELECT l.doc_id, l.dl, c.term, c.cf, s.c_total
    FROM lens l CROSS JOIN cf c CROSS JOIN csize s
),
scored AS (
    SELECT co.doc_id,
           CAST(sum(CASE WHEN coalesce(t.n_tf, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_terms_matched,
           round(sum(ln((coalesce(t.n_tf, 0)
                         + {QL_MU} * co.cf / co.c_total)
                        / (co.dl + {QL_MU}))), 4) AS score
    FROM combo co
    LEFT JOIN tf t ON t.doc_id = co.doc_id AND t.term = co.term
    GROUP BY co.doc_id
)
SELECT doc_id, n_terms_matched, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {QL_TOPK}
"""

QUERIES["ql_dirichlet_retrieval"] = (_ql_dirichlet, _QL_SQL)


# --------------------------------------------------------------------------
# impact_sparse_retrieval: quantized-impact inverted-index serving
# --------------------------------------------------------------------------
IMPACT_TERMS = ("spark", "merge", "window", "batch")
IMPACT_LEVELS = 8
IMPACT_TOPK = 20


def _impact_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-sparse retrieval serving shape (SPLADE/DeepImpact): each
    posting carries a small INTEGER impact weight — here tf × an
    idf bucket quantized to {IMPACT_LEVELS} levels — and scoring is a
    pure integer sum over the query's posting lists. The whole ranking
    is exact int64 (no floats at all), which is the very property that
    lets production impact indexes store 8-bit weights.

    Scale: identical posting shape to bm25_topk — the term filter dies
    in the scan, df is |Q| rows broadcast, the integer top-k is
    TakeOrdered. At 100 TB the (term → postings) frame is the
    inverted index itself, bucketed by term.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    .alias("w")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    tf = (docs.select("doc_id", F.explode("w").alias("term"))
          .where(F.col("term").isin(*IMPACT_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # idf bucket in 1..LEVELS: rarer term -> higher bucket, all integer
    bucket = F.expr(f"greatest(1L, least({IMPACT_LEVELS}L,"
                    f" ({IMPACT_LEVELS} * (n - df)) div n + 1))")
    impacts = (tf.join(F.broadcast(dfreq), "term")
               .crossJoin(F.broadcast(n_docs))
               .select("doc_id", "term",
                       (F.col("n_tf") * bucket).alias("impact")))
    scored = (impacts.groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                   F.sum("impact").cast("long").alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")) \
        .limit(IMPACT_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select("doc_id", "n_terms_matched", "score",
                      F.row_number().over(w).alias("rank"))


_IMPACT_SQL = rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n_tf
    FROM (SELECT doc_id, unnest(w) AS term FROM docs)
    WHERE term IN ({", ".join(repr(t) for t in IMPACT_TERMS)})
    GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
impacts AS (
    SELECT t.doc_id, t.term,
           t.n_tf * greatest(CAST(1 AS BIGINT),
               least(CAST({IMPACT_LEVELS} AS BIGINT),
                     ({IMPACT_LEVELS} * (n.n - d.df)) // n.n + 1))
               AS impact
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN n_docs n
),
scored AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum(impact) AS BIGINT) AS score
    FROM impacts GROUP BY doc_id
)
SELECT doc_id, n_terms_matched, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {IMPACT_TOPK}
"""

QUERIES["impact_sparse_retrieval"] = (_impact_sparse, _IMPACT_SQL)


# --------------------------------------------------------------------------
# speculative_accept_rate: bigram-draft acceptance by position bucket
# --------------------------------------------------------------------------
SPEC_POS_BUCKETS = 10
SPEC_BUCKET_WIDTH = 10  # words per bucket; tail pools into the last


def _speculative_accept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speculative-decoding planning metric: if a bigram draft model
    (argmax next word given current word, fit on this corpus) proposed
    each next token, what fraction would the target accept — broken
    down by position bucket (early tokens are easier)? This is the
    corpus-side estimate serving teams compute before picking a draft
    model depth.

    Determinism: the draft argmax breaks count ties by word ASC via
    struct-min (CLAUDE.md rank-tie rule); buckets are integer
    divisions of the 0-based position.

    Scale: word pairs come from ONE posexplode + a self-zip via lead
    over (doc, position) — no corpus self-join; the bigram model is
    |vocab|² rows max, joined hash-keyed on the md5 of the current
    word (never the raw token). The final histogram is 10 rows.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    .alias("w")))
    toks = docs.select(
        "doc_id", F.posexplode("w").alias("pos", "cur"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (toks
             .withColumn("nxt", F.lead("cur").over(wdoc))
             .where(F.col("nxt").isNotNull())
             .select(F.unhex(F.md5("cur")).alias("ck"), "nxt", "pos"))
    model = (pairs.groupBy("ck", "nxt")
             .agg(F.count(F.lit(1)).alias("c"))
             .groupBy("ck")
             .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                 F.col("nxt").alias("t")))
                  .getField("t").alias("draft")))
    bucket = F.least(F.expr(f"pos div {SPEC_BUCKET_WIDTH}"),
                     F.lit(SPEC_POS_BUCKETS - 1)).cast("int")
    return (pairs.join(model, "ck")
            .groupBy(bucket.alias("pos_bucket"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.when(F.col("nxt") == F.col("draft"), 1)
                       .otherwise(0)).alias("n_accept"))
            .select("pos_bucket", "n_pairs", "n_accept",
                    F.expr("1000000 * n_accept div n_pairs")
                    .alias("accept_e6")))


_SPEC_SQL = rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
toks AS (
    SELECT doc_id, t.i - 1 AS pos, w[t.i] AS cur
    FROM docs, unnest(range(1, len(w) + 1)) AS t(i)
),
pairs AS (
    SELECT unhex(md5(cur)) AS ck,
           lead(cur) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
           pos
    FROM toks
),
pairs_ne AS (SELECT * FROM pairs WHERE nxt IS NOT NULL),
model AS (
    SELECT ck, (min(struct_pack(nc := -c, t := nxt))).t AS draft
    FROM (SELECT ck, nxt, CAST(count(*) AS BIGINT) AS c
          FROM pairs_ne GROUP BY 1, 2)
    GROUP BY ck
)
SELECT CAST(least(p.pos // {SPEC_BUCKET_WIDTH},
                  {SPEC_POS_BUCKETS - 1}) AS INT) AS pos_bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN p.nxt = m.draft THEN 1 ELSE 0 END) AS BIGINT)
           AS n_accept,
       1000000 * CAST(sum(CASE WHEN p.nxt = m.draft THEN 1 ELSE 0 END)
                      AS BIGINT) // CAST(count(*) AS BIGINT) AS accept_e6
FROM pairs_ne p JOIN model m USING (ck)
GROUP BY 1
"""

QUERIES["speculative_accept_rate"] = (_speculative_accept, _SPEC_SQL)

# --------------------------------------------------------------------------
# Recommendation-quality audits over co-order top-K lists
# --------------------------------------------------------------------------
_REC_K = 5
_REC_MIN_PAIR = 2


def _rec_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor part i, recommended part j, rank 1..K) — top-K co-order
    neighbors per part ranked by raw co-occurrence count (tie-break
    j ASC). Same basket-pair shape as operators/recsys_queries
    (one l_orderkey shuffle reused by both self-join sides); scoring
    stays integer so the lists are bit-stable."""
    baskets = (load(spark, sf_dir, "lineitem")
               .select("l_orderkey", "l_partkey")
               .repartition("l_orderkey")
               .dropDuplicates(["l_orderkey", "l_partkey"]))
    a = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("i"))
    b = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("j"))
    pairs = (a.join(b, "ok").where(F.col("i") != F.col("j"))
             .groupBy("i", "j").agg(F.count(F.lit(1)).alias("c_ij"))
             .where(F.col("c_ij") >= _REC_MIN_PAIR))
    w = Window.partitionBy("i").orderBy(F.desc("c_ij"), F.asc("j"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= _REC_K)
            .select("i", "j", "rk"))


_REC_LISTS_CTE = f"""
baskets AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem
),
co AS (
    SELECT a.l_partkey AS i, b.l_partkey AS j,
           CAST(count(*) AS BIGINT) AS c_ij
    FROM baskets a JOIN baskets b USING (ok)
    WHERE a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {_REC_MIN_PAIR}
),
lists AS (
    SELECT i, j, rk FROM (
        SELECT i, j,
               CAST(row_number() OVER (PARTITION BY i
                    ORDER BY c_ij DESC, j ASC) AS INT) AS rk
        FROM co)
    WHERE rk <= {_REC_K}
)
"""


def _intra_list_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-list diversity (ILD) of the co-order top-K rec lists,
    rolled up by the anchor part's brand: over every unordered pair of
    recommended items within one list, the share of (brand, type)
    attribute disagreements — the metric that catches "5 near-identical
    recs" even when accuracy looks great.

    Scale: the within-list pair join is rank-bounded (≤ K(K-1)/2 = 10
    pairs per anchor — a self-join on the anchor key with rk_a <
    rk_b); attribute lookups are dimension joins on p_partkey. All
    integer; ild_e6 = 1e6 · disagreements div (2 · n_pairs).
    """
    lists = _rec_lists(spark, sf_dir)
    attrs = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("j"), "p_brand", "p_type")
    lw = lists.join(attrs, "j")
    la = lw.select("i", F.col("rk").alias("rk_a"),
                   F.col("p_brand").alias("brand_a"),
                   F.col("p_type").alias("type_a"))
    lb = lw.select("i", F.col("rk").alias("rk_b"),
                   F.col("p_brand").alias("brand_b"),
                   F.col("p_type").alias("type_b"))
    pp = (la.join(lb, "i").where(F.col("rk_a") < F.col("rk_b"))
          .select("i",
                  ((F.col("brand_a") != F.col("brand_b")).cast("long")
                   + (F.col("type_a") != F.col("type_b")).cast("long"))
                  .alias("pts")))
    anchor_brand = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("i"),
        F.col("p_brand").alias("anchor_brand"))
    return (pp.join(anchor_brand, "i")
            .groupBy("anchor_brand")
            .agg(F.countDistinct("i").alias("n_lists"),
                 F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("pts").alias("disagreements"))
            .select("anchor_brand", "n_lists", "n_pairs",
                    F.col("disagreements").cast("long")
                    .alias("disagreements"),
                    F.expr("1000000 * disagreements div (2 * n_pairs)")
                    .alias("ild_e6")))


_ILD_SQL = f"""
WITH {_REC_LISTS_CTE},
lw AS (
    SELECT l.i, l.rk, p.p_brand, p.p_type
    FROM lists l JOIN part p ON p.p_partkey = l.j
),
pp AS (
    SELECT a.i,
           (CASE WHEN a.p_brand <> b.p_brand THEN 1 ELSE 0 END
            + CASE WHEN a.p_type <> b.p_type THEN 1 ELSE 0 END) AS pts
    FROM lw a JOIN lw b ON a.i = b.i AND a.rk < b.rk
)
SELECT p.p_brand AS anchor_brand,
       CAST(count(DISTINCT pp.i) AS BIGINT) AS n_lists,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(pts) AS BIGINT) AS disagreements,
       1000000 * CAST(sum(pts) AS BIGINT)
           // (2 * CAST(count(*) AS BIGINT)) AS ild_e6
FROM pp JOIN part p ON p.p_partkey = pp.i
GROUP BY 1
"""

QUERIES["intra_list_diversity"] = (_intra_list_diversity, _ILD_SQL)


def _catalog_coverage_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage + popularity-bias audit of the co-order rec
    lists: what share of the catalog is ever recommended, and how
    concentrated is exposure among the most-recommended items (the
    share of all list slots taken by the top-decile-by-exposure
    items). The recommender-governance numbers reported next to
    accuracy.

    Determinism: the decile threshold is a VALUE threshold — the first
    exposure value (descending) at which cumulative item count reaches
    ceil(N/10) — so ties at the cut are wholly included in both
    engines. Scale: exposures aggregate to catalog cardinality;
    the cumulative walk runs on the exposure-VALUE run table (distinct
    count values — bounded), not on items.
    """
    lists = _rec_lists(spark, sf_dir)
    expo = lists.groupBy("j").agg(F.count(F.lit(1)).alias("e"))
    n_cat = load(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_catalog"))
    runs = expo.groupBy("e").agg(F.count(F.lit(1)).alias("n_items"),
                                 F.sum("e").alias("slots"))
    wcum = (Window.orderBy(F.desc("e"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    walked = runs.select(
        "e",
        F.sum("n_items").over(wcum).alias("cum_items"),
        F.sum("slots").over(wcum).alias("cum_slots"),
        F.sum("n_items").over(wall).alias("n_rec"),
        F.sum("slots").over(wall).alias("tot_slots"))
    cut = (walked
           .where(F.col("cum_items") * 10 >= F.col("n_rec") + 9)
           .agg(F.max(F.struct(F.col("e").alias("e"),
                               F.col("cum_items").alias("ci"),
                               F.col("cum_slots").alias("cs"),
                               F.col("n_rec").alias("nr"),
                               F.col("tot_slots").alias("ts"))).alias("b")))
    return (cut.crossJoin(F.broadcast(n_cat))
            .select(F.col("n_catalog").cast("long").alias("n_catalog"),
                    F.col("b.nr").cast("long").alias("n_recommended"),
                    F.expr("1000000 * b.nr div n_catalog")
                    .alias("coverage_e6"),
                    F.col("b.e").cast("long").alias("decile_cut_exposure"),
                    F.col("b.ci").cast("long").alias("n_top_items"),
                    F.expr("1000000 * b.cs div b.ts")
                    .alias("top_share_e6")))


_COVERAGE_BIAS_SQL = f"""
WITH {_REC_LISTS_CTE},
expo AS (SELECT j, CAST(count(*) AS BIGINT) AS e FROM lists GROUP BY j),
runs AS (
    SELECT e, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(e) AS BIGINT) AS slots
    FROM expo GROUP BY e
),
walked AS (
    SELECT e,
           CAST(sum(n_items) OVER (ORDER BY e DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_items,
           CAST(sum(slots) OVER (ORDER BY e DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_slots,
           CAST(sum(n_items) OVER () AS BIGINT) AS n_rec,
           CAST(sum(slots) OVER () AS BIGINT) AS tot_slots
    FROM runs
),
cut AS (
    SELECT max(struct_pack(e := e, ci := cum_items, cs := cum_slots,
                           nr := n_rec, ts := tot_slots)) AS b
    FROM walked WHERE cum_items * 10 >= n_rec + 9
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_catalog,
       b.nr AS n_recommended,
       1000000 * b.nr // (SELECT CAST(count(*) AS BIGINT) FROM part)
           AS coverage_e6,
       b.e AS decile_cut_exposure,
       b.ci AS n_top_items,
       1000000 * b.cs // b.ts AS top_share_e6
FROM cut
"""

QUERIES["catalog_coverage_bias"] = (_catalog_coverage_bias,
                                    _COVERAGE_BIAS_SQL)


# --------------------------------------------------------------------------
# rank_biased_overlap: RBO between the lexical and semantic rankings
# --------------------------------------------------------------------------
RBO_P = 0.9


def _rbo_weights() -> list[tuple[int, int]]:
    """(depth, round(1e12·(1−p)·p^(d−1)/d)) — weights precomputed in
    Python and injected as identical integer literals in BOTH engines,
    so no engine's pow()/libm is in the comparison path."""
    from ..plans import analytics_queries as A

    return [(d, round(1e12 * (1 - RBO_P) * RBO_P ** (d - 1) / d))
            for d in range(1, A.RRF_LIST_K + 1)]


def _rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between the BM25 lexical
    top-k and the embedding-cosine semantic top-k — the
    index-drift/AB-diff metric for comparing two rankings that need
    not share items: RBO@k = (1−p)·Σ_d p^(d−1)·|A_d ∩ B_d|/d. The
    prefix-intersection size X_d is #{items in both lists with
    max(lex_rank, sem_rank) ≤ d}, so the whole metric is exact integer
    arithmetic against the precomputed weight table. Output: one row
    per depth with X_d and the cumulative RBO so far (e12).

    Scale: both rankings end in TakeOrdered top-k (bounded); the
    depth table is a literal; everything joins k-row frames.
    """
    from ..plans import analytics_queries as A
    from ..operators import similarity as S

    lex = (A._bm25(spark, sf_dir)
           .select("doc_id", F.col("rank").cast("long").alias("lr")))
    emb = load(spark, sf_dir, "embeddings")
    sem = (S.brute_force_topk(emb, "vec_id", "embedding",
                              [A.RRF_SEM_QID], k=A.RRF_LIST_K)
           .select(F.col("neighbor_id").alias("doc_id"),
                   F.col("rank").cast("long").alias("sr")))
    both = lex.join(sem, "doc_id").select(
        F.greatest("lr", "sr").alias("m"))
    weights = spark.createDataFrame(_rbo_weights(), "d long, w_e12 long")
    xd = (F.broadcast(weights)
          .join(both, F.col("m") <= F.col("d"), "left")
          .groupBy("d", "w_e12")
          .agg(F.count("m").cast("long").alias("x_d")))
    wcum = (Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0))
    return (xd.select("d", "x_d",
                      (F.col("w_e12") * F.col("x_d")).alias("term_e12"))
            .select("d", "x_d",
                    F.sum("term_e12").over(wcum).alias("rbo_cum_e12")))


def _rbo_sql() -> str:
    from ..plans import analytics_queries as A
    from ..operators.similarity_queries import _sql_dot, _sql_norm, _sql_vec

    weights = ", ".join(f"({d}, {w})" for d, w in _rbo_weights())
    return f"""
WITH lex AS (
  SELECT doc_id, CAST(rank AS BIGINT) AS lr FROM ({A._BM25_SQL})
),
e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {A.RRF_SEM_QID}),
sem AS (
  SELECT vec_id AS doc_id, CAST(rank AS BIGINT) AS sr
  FROM (
    SELECT e.vec_id,
           row_number() OVER (
               ORDER BY round({_sql_dot('q.qv', 'e.v')}
                   / ({_sql_norm('q.qv')} * {_sql_norm('e.v')}), 6) DESC,
                   e.vec_id ASC) AS rank
    FROM e CROSS JOIN q WHERE e.vec_id <> {A.RRF_SEM_QID}
  ) WHERE rank <= {A.RRF_LIST_K}
),
both_m AS (
  SELECT greatest(l.lr, s.sr) AS m
  FROM lex l JOIN sem s USING (doc_id)
),
weights (d, w_e12) AS (VALUES {weights}),
xd AS (
  SELECT w.d, w.w_e12, CAST(count(b.m) AS BIGINT) AS x_d
  FROM weights w LEFT JOIN both_m b ON b.m <= w.d
  GROUP BY 1, 2
)
SELECT d, x_d,
       CAST(sum(w_e12 * x_d) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS rbo_cum_e12
FROM xd
"""


QUERIES["rank_biased_overlap"] = (_rank_biased_overlap, _rbo_sql())
