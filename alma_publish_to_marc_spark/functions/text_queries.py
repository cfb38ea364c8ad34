"""Oracle-checked text-analysis queries over the `documents` table.

The DuckDB SQL mirrors the Spark expressions primitive-for-primitive
(same tokenization, same rolling hash, same arithmetic order) so values
hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import text as T

# --- shared SQL fragments (keep in lockstep with functions/text.py) -----
SQL_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
SQL_POLY = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ord(c) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)


def _marker_sql(markers: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return (f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
            f"t -> list_contains({arr}, t)))")


# --- token stats ---------------------------------------------------------
def _token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.avg_token_len(F.col("text")).alias("avg_token_len"),
        F.length("text").alias("n_chars_actual"),
    )


_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len({SQL_TOKS}) AS n_tokens,
       round(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform({SQL_TOKS}, t -> CAST(length(t) AS BIGINT))),
             (a, b) -> a + b)
             / greatest(len({SQL_TOKS}), 1), 4) AS avg_token_len,
       length(text) AS n_chars_actual
FROM documents
"""


# --- language ID ---------------------------------------------------------
def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_tagged"),
        T.lang_id(F.col("text")).alias("lang_pred"),
    )


def _lang_id_sql() -> str:
    s = {lang: _marker_sql(m) for lang, m in T.LANG_MARKERS.items()}
    return f"""
SELECT doc_id, lang AS lang_tagged,
       CASE WHEN best = 0 THEN 'und'
            WHEN s_en = best THEN 'en'
            WHEN s_es = best THEN 'es'
            WHEN s_fr = best THEN 'fr'
       END AS lang_pred
FROM (
    SELECT doc_id, lang, s_en, s_es, s_fr,
           greatest(s_en, s_es, s_fr) AS best
    FROM (
        SELECT doc_id, lang,
               {s['en']} AS s_en,
               {s['es']} AS s_es,
               {s['fr']} AS s_fr
        FROM documents
    )
)
"""


# --- quality score -------------------------------------------------------
def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


# DuckDB twins of text.avg_token_len / punct_ratio / stopword_ratio —
# shared by every oracle that featurizes text (quality score, classifier
# serving); keep in lockstep with functions/text.py
def sql_avg_token_len(toks: str = SQL_TOKS) -> str:
    return (f"round(list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), "
            f"(a, b) -> a + b) / greatest(len({toks}), 1), 4)")


def sql_punct_ratio() -> str:
    return ("round(len(list_filter(string_split(text, ''), "
            "c -> list_contains(['.', ',', ';', ':', '!', '?'], c))) "
            "/ greatest(length(text), 1), 4)")


def sql_stopword_ratio(toks: str = SQL_TOKS) -> str:
    en = _marker_sql(T.LANG_MARKERS["en"])
    return f"round({en} / greatest(len({toks}), 1), 4)"


def _quality_sql() -> str:
    toks = SQL_TOKS
    atl = sql_avg_token_len()
    punct = sql_punct_ratio()
    stop = sql_stopword_ratio()
    return f"""
SELECT doc_id, n_tokens, stopword_ratio, punct_ratio,
       round(0.4 * least(n_tokens / 100.0, 1.0)
           + 0.2 * (CASE WHEN avg_tl >= 3 AND avg_tl <= 10 THEN 1.0 ELSE 0.5 END)
           + 0.2 * least(stopword_ratio * 5, 1.0)
           + 0.2 * (1.0 - least(punct_ratio * 10, 1.0)), 4) AS quality
FROM (
    SELECT doc_id,
           len({toks}) AS n_tokens,
           {stop} AS stopword_ratio,
           {punct} AS punct_ratio,
           {atl} AS avg_tl
    FROM documents
)
"""


# --- preference pairs (alignment-data prep) ------------------------------
PREF_PAIRS_PER_SOURCE = 3


def _preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-model / DPO data prep: per source, pair the i-th BEST
    document with the i-th WORST by quality score (i ≤ 3), keeping only
    pairs with a strictly positive gap — the chosen/rejected pair
    construction an alignment pipeline runs over scored corpora.

    Scale: two WindowGroupLimit rank passes over the same source-keyed
    shuffle (top-k and bottom-k are both map-side-pruned to ≤k rows per
    source before the exchange), then a join on (source, rank) between
    two ≤k·|sources| frames — negligible. Deterministic tie-breaks:
    best ranks break ties by ascending doc_id, worst by descending, so
    a source whose docs all tie yields no pairs (gap filter) rather
    than arbitrary ones."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         T.quality_score(F.col("text")).alias("quality"))
    w_hi = Window.partitionBy("source").orderBy(F.desc("quality"),
                                                F.asc("doc_id"))
    w_lo = Window.partitionBy("source").orderBy(F.asc("quality"),
                                                F.desc("doc_id"))
    hi = (scored.withColumn("pair_rank", F.row_number().over(w_hi))
          .where(F.col("pair_rank") <= PREF_PAIRS_PER_SOURCE)
          .select("source", "pair_rank",
                  F.col("doc_id").alias("chosen_doc"),
                  F.col("quality").alias("chosen_quality")))
    lo = (scored.withColumn("pair_rank", F.row_number().over(w_lo))
          .where(F.col("pair_rank") <= PREF_PAIRS_PER_SOURCE)
          .select("source", "pair_rank",
                  F.col("doc_id").alias("rejected_doc"),
                  F.col("quality").alias("rejected_quality")))
    return (hi.join(lo, ["source", "pair_rank"])
            .where(F.col("chosen_quality") > F.col("rejected_quality"))
            .select("source", "pair_rank", "chosen_doc", "rejected_doc",
                    F.round(F.col("chosen_quality")
                            - F.col("rejected_quality"), 4)
                     .alias("quality_gap")))


def _preference_pairs_sql() -> str:
    toks = SQL_TOKS
    atl = sql_avg_token_len()
    punct = sql_punct_ratio()
    stop = sql_stopword_ratio()
    p = PREF_PAIRS_PER_SOURCE
    return f"""
WITH feats AS (
    SELECT doc_id, source,
           len({toks}) AS n_tokens,
           {stop} AS stopword_ratio,
           {punct} AS punct_ratio,
           {atl} AS avg_tl
    FROM documents
),
scored AS (
    SELECT doc_id, source,
           round(0.4 * least(n_tokens / 100.0, 1.0)
               + 0.2 * (CASE WHEN avg_tl >= 3 AND avg_tl <= 10
                             THEN 1.0 ELSE 0.5 END)
               + 0.2 * least(stopword_ratio * 5, 1.0)
               + 0.2 * (1.0 - least(punct_ratio * 10, 1.0)), 4) AS quality
    FROM feats
),
hi AS (
    SELECT source, doc_id AS chosen_doc, quality AS chosen_quality,
           row_number() OVER (PARTITION BY source
                              ORDER BY quality DESC, doc_id ASC)
               AS pair_rank
    FROM scored QUALIFY pair_rank <= {p}
),
lo AS (
    SELECT source, doc_id AS rejected_doc, quality AS rejected_quality,
           row_number() OVER (PARTITION BY source
                              ORDER BY quality ASC, doc_id DESC)
               AS pair_rank
    FROM scored QUALIFY pair_rank <= {p}
)
SELECT hi.source, CAST(hi.pair_rank AS INT) AS pair_rank,
       hi.chosen_doc, lo.rejected_doc,
       round(hi.chosen_quality - lo.rejected_quality, 4) AS quality_gap
FROM hi JOIN lo ON hi.source = lo.source AND hi.pair_rank = lo.pair_rank
WHERE hi.chosen_quality > lo.rejected_quality
"""


# --- per-source quality calibration ---------------------------------------
def _quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile calibration of the quality score WITHIN each source:
    a doc's calibrated score is its percent_rank among its own source's
    docs — the preprocessing that makes scores comparable across
    sources whose raw distributions differ (a mediocre doc from a
    high-quality source shouldn't outrank a great doc from a noisy
    one when the mix samples per-source).

    One window pass over the source-keyed shuffle; ties (identical raw
    scores) share a percent_rank by definition, so the output is
    deterministic without an id tie-break."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         T.quality_score(F.col("text")).alias("quality"))
    w = Window.partitionBy("source").orderBy("quality")
    return scored.select(
        "doc_id", "source", "quality",
        F.round(F.percent_rank().over(w), 4).alias("quality_calibrated"))


def _quality_calibrated_sql() -> str:
    toks = SQL_TOKS
    atl = sql_avg_token_len()
    punct = sql_punct_ratio()
    stop = sql_stopword_ratio()
    return f"""
WITH feats AS (
    SELECT doc_id, source,
           len({toks}) AS n_tokens,
           {stop} AS stopword_ratio,
           {punct} AS punct_ratio,
           {atl} AS avg_tl
    FROM documents
),
scored AS (
    SELECT doc_id, source,
           round(0.4 * least(n_tokens / 100.0, 1.0)
               + 0.2 * (CASE WHEN avg_tl >= 3 AND avg_tl <= 10
                             THEN 1.0 ELSE 0.5 END)
               + 0.2 * least(stopword_ratio * 5, 1.0)
               + 0.2 * (1.0 - least(punct_ratio * 10, 1.0)), 4) AS quality
    FROM feats
)
SELECT doc_id, source, quality,
       round(percent_rank() OVER (PARTITION BY source ORDER BY quality), 4)
           AS quality_calibrated
FROM scored
"""


# --- language-ID evaluation ------------------------------------------------
def _lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language-ID heuristic against the
    corpus's ground-truth ``lang`` labels — the evaluation every
    classifier in the curation funnel owes its users (the funnel drops
    docs on ``lang_pred``; this measures what that costs per true
    language). One row per (true, predicted) pair with the share of
    the true class ("recall" on the diagonal).

    Scale: one scan-fused prediction pass and one map-side-combined
    aggregation to |langs|² rows; the per-true-class totals join two
    tiny frames."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("lang").alias("true_lang"),
        T.lang_id(F.col("text")).alias("pred_lang"))
    cells = docs.groupBy("true_lang", "pred_lang") \
        .agg(F.count(F.lit(1)).alias("n"))
    totals = cells.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return (cells.join(totals, "true_lang")
            .select("true_lang", "pred_lang", "n",
                    F.round(F.col("n") / F.col("n_true"), 4)
                     .alias("share_of_true")))


def _pred_cte() -> str:
    # exact mirror of functions/text.lang_id (same CASE chain and
    # tie-break order as the green doc_lang_id oracle above); shared
    # by the confusion and kappa oracles so they can never drift apart
    s = {lang: _marker_sql(m) for lang, m in T.LANG_MARKERS.items()}
    return f"""pred AS (
    SELECT lang AS true_lang,
           CASE WHEN best = 0 THEN 'und'
                WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es'
                WHEN s_fr = best THEN 'fr'
           END AS pred_lang
    FROM (
        SELECT lang, s_en, s_es, s_fr,
               greatest(s_en, s_es, s_fr) AS best
        FROM (
            SELECT lang,
                   {s['en']} AS s_en,
                   {s['es']} AS s_es,
                   {s['fr']} AS s_fr
            FROM documents
        )
    )
)"""


def _lang_id_confusion_sql() -> str:
    return f"""
WITH {_pred_cte()},
cells AS (
    SELECT true_lang, pred_lang, count(*) AS n
    FROM pred GROUP BY true_lang, pred_lang
),
totals AS (SELECT true_lang, sum(n) AS n_true FROM cells
           GROUP BY true_lang)
SELECT c.true_lang, c.pred_lang, c.n,
       round(c.n / t.n_true, 4) AS share_of_true
FROM cells c JOIN totals t USING (true_lang)
"""


# --- rolling fingerprint -------------------------------------------------
def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.rolling_fingerprint(F.col("text")).alias("fingerprint"))


_FINGERPRINT_SQL = f"""
SELECT doc_id,
       {SQL_POLY.format(s=f"array_to_string({SQL_TOKS}, ' ')")} AS fingerprint
FROM documents
"""


# --- deterministic train/val/test split ----------------------------------
_SPLIT_MOD = 1_000_000_007
_SPLIT_MULT = 2_654_435_761  # Knuth multiplicative constant


def _dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline staple: a stable 80/10/10 split keyed on doc_id
    so membership never changes as the corpus grows or repartitions.
    Pure integer arithmetic (multiplicative hash mod 1e9+7, bounded so
    ANSI bigint never overflows) — identical in any engine, no rand()."""
    docs = load(spark, sf_dir, "documents")
    bucket = ((F.col("doc_id") % _SPLIT_MOD) * _SPLIT_MULT) % _SPLIT_MOD % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "validation")
             .otherwise("test"))
    return (docs.select(split.alias("split"), "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


_SPLIT_SQL = f"""
SELECT CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'validation'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT n_chars,
           ((doc_id % {_SPLIT_MOD}) * {_SPLIT_MULT}) % {_SPLIT_MOD} % 100 AS b
    FROM documents
) GROUP BY 1
"""


# --- sliding-window document chunking ------------------------------------
_CHUNK = 500   # chars per chunk
_STRIDE = 400  # 100-char overlap between adjacent chunks


def _doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for training data: each document becomes
    ⌈L/stride⌉ overlapping 500-char windows. Pure narrow ops — sequence
    + explode never shuffle; output partitioning inherits the scan, so
    at 100 TB this runs scan-speed with zero exchanges."""
    docs = load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.floor((F.greatest(F.length("text"), F.lit(1)) - 1)
                          / _STRIDE))
    chunk = F.substring(F.col("text"), F.col("chunk_idx") * _STRIDE + 1,
                        _CHUNK)
    return (docs.select("doc_id", "lang", "text",
                        F.explode(starts).alias("chunk_idx"))
            .select("doc_id", "lang",
                    F.col("chunk_idx").cast("int").alias("chunk_idx"),
                    chunk.alias("chunk_text"),
                    F.length(chunk).alias("chunk_len")))


_CHUNKING_SQL = f"""
SELECT doc_id, lang,
       CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i * {_STRIDE} + 1 AS BIGINT), {_CHUNK}) AS chunk_text,
       length(substr(text, CAST(i * {_STRIDE} + 1 AS BIGINT), {_CHUNK}))
           AS chunk_len
FROM documents,
     unnest(generate_series(0,
         CAST(floor((greatest(length(text), 1) - 1) / {_STRIDE}) AS BIGINT)))
     AS t(i)
"""


# --- sequence packing (concat-then-split token binning) -------------------
_PACK_BUDGET = 256  # tokens per packed sequence


def _sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-style sequence packing: concatenate documents in a
    stable order (doc_id) per language stream, then split at fixed
    token-budget boundaries. pack_id = floor(start_offset / budget) via
    a window cumsum — one shuffle on lang, exact integer arithmetic, so
    membership is reproducible on any cluster layout."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = docs.select("doc_id", "lang", n_tok.cast("long").alias("n_tok"))
    packed = toks.select(
        "lang", "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _PACK_BUDGET)
         .alias("pack_id"))
    return (packed.groupBy("lang", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("tokens_in_pack")))


_PACKING_SQL = f"""
SELECT lang, pack_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens_in_pack
FROM (
    SELECT lang,
           n_tok,
           CAST(floor((sum(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS pack_id
    FROM (
        SELECT doc_id, lang,
               CAST(len({SQL_TOKS}) AS BIGINT) AS n_tok
        FROM documents
    )
)
GROUP BY lang, pack_id
"""


# --- stratified deterministic sampling -----------------------------------
_SAMPLE_PCT = 30  # per-stratum keep fraction


def _stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stratified sampling: EXACTLY the lowest 30% of each language
    stratum by a multiplicative doc_id hash (percent_rank over the hash
    order). Membership is a pure function of the data — identical on any
    cluster, partitioning, or run, unlike rand()/sampleBy which need
    seeds AND a stable partition layout. One shuffle (the stratum
    window); the hash order also makes the per-stratum fraction exact,
    which a plain `hash % 100 < 30` filter only hits in expectation."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % _SPLIT_MOD) * (_SPLIT_MULT + 17)) % _SPLIT_MOD
    w = Window.partitionBy("lang").orderBy("_h", "doc_id")
    return (docs.withColumn("_h", h)
            .withColumn("_pr", F.percent_rank().over(w))
            .where(F.col("_pr") <= _SAMPLE_PCT / 100.0)
            .select("doc_id", "lang", "source"))


_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM (
    SELECT doc_id, lang, source,
           percent_rank() OVER (
               PARTITION BY lang
               ORDER BY ((doc_id % {_SPLIT_MOD}) * {_SPLIT_MULT + 17})
                        % {_SPLIT_MOD}, doc_id) AS pr
    FROM documents
)
WHERE pr <= {_SAMPLE_PCT / 100.0}
"""


# --- BPE-ish token estimation ---------------------------------------------
def _bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting for training data: whitespace tokens vs BPE-ish
    subword estimate (pre-tokenize into alpha/digit/symbol runs, charge
    max(1, ceil(len/4)) per run). Scan-speed column ops, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_ws_tokens"),
        F.size(T.bpe_pretokens(F.col("text"))).alias("n_pretokens"),
        T.bpe_token_estimate(F.col("text")).alias("n_bpe_est"))


_BPE_SQL = rf"""
SELECT doc_id,
       len({SQL_TOKS}) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{T.BPE_PRETOKEN_RE}')) AS INT)
           AS n_pretokens,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_extract_all(lower(text), '{T.BPE_PRETOKEN_RE}'),
               t -> greatest(CAST(1 AS BIGINT),
                             CAST(ceil(length(t) / 4.0) AS BIGINT)))),
           (a, b) -> a + b) AS n_bpe_est
FROM documents
"""


# --- PII redaction --------------------------------------------------------
# Conservative literal-class regexes, identical under Java regex and RE2.
_RE_EMAIL = r"[a-z0-9]+@[a-z]+\.com"
_RE_PHONE = r"\+1-555-[0-9]{4}"
_RE_IP = r"10\.0\.[0-9]+\.1"


def _pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline PII scrub: count and redact emails / phone
    numbers / IPs. Both engines synthesize the same dirty text in-query
    (the corpus carries no PII), then redact with the same regexes; the
    redacted payload is compared by md5 (corpus is pure ASCII, so
    DuckDB's md5(VARCHAR) hashes the same bytes). Pure regexp column
    ops — scan-speed, no shuffle, no UDFs."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.col("text"), F.lit(" Contact user"), d, F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE, "<PHONE>"),
        _RE_IP, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(_RE_EMAIL)).alias("n_emails"),
        F.regexp_count(dirty, F.lit(_RE_PHONE)).alias("n_phones"),
        F.regexp_count(dirty, F.lit(_RE_IP)).alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"))


_PII_SQL = rf"""
WITH d AS (
    SELECT doc_id,
           text || ' Contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               AS dirty
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{_RE_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '{_RE_PHONE}')) AS INT)
           AS n_phones,
       CAST(len(regexp_extract_all(dirty, '{_RE_IP}')) AS INT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(dirty,
               '{_RE_EMAIL}', '<EMAIL>', 'g'),
               '{_RE_PHONE}', '<PHONE>', 'g'),
               '{_RE_IP}', '<IP>', 'g')) AS redacted_md5
FROM d
"""


# --- benchmark decontamination (n-gram overlap) ---------------------------
_DECON_N = 8          # words per shingle
_DECON_BENCH_MOD = 7  # doc_id % mod == 0 -> benchmark member


def _shingles(col, n: int):
    words = F.split(F.trim(col), r"\s+")
    idx = F.when(F.size(words) >= n,
                 F.sequence(F.lit(1), F.size(words) - (n - 1))) \
           .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))


def _decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, the eval-leakage gate every training
    pipeline needs: flag corpus documents sharing any 8-word shingle
    with the benchmark set (here: doc_id % 7 == 0 stands in for the
    held-out benchmark). The benchmark shingle set is fixed-size by
    definition (it does NOT grow with the corpus), so it is broadcast
    and the corpus-side scan stays shuffle-free until the final per-doc
    count — the same shape at 100 TB with a real eval suite."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _DECON_BENCH_MOD == 0
    sh = docs.select("doc_id", is_bench.alias("is_bench"),
                     F.explode(_shingles(F.col("text"), _DECON_N))
                      .alias("shingle"))
    bench = (sh.where(F.col("is_bench"))
             .select("shingle").distinct())
    return (sh.where(~F.col("is_bench"))
            .join(F.broadcast(bench), "shingle")
            .groupBy("doc_id")
            .agg(F.countDistinct("shingle").alias("n_contaminated_shingles")))


_DECON_SQL = f"""
WITH sh AS (
    SELECT doc_id, doc_id % {_DECON_BENCH_MOD} = 0 AS is_bench, s.shingle
    FROM documents,
         unnest(list_transform(
             generate_series(1, greatest(
                 len(regexp_split_to_array(trim(text), '\\s+'))
                     - {_DECON_N - 1}, 0)),
             i -> array_to_string(
                 regexp_split_to_array(trim(text), '\\s+')[i:i+{_DECON_N - 1}],
                 ' '))) AS s(shingle)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE is_bench)
SELECT doc_id, count(DISTINCT sh.shingle) AS n_contaminated_shingles
FROM sh JOIN bench USING (shingle)
WHERE NOT is_bench
GROUP BY doc_id
"""


# --- repetition / gibberish quality stats ---------------------------------
def _repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction,
    duplicate-trigram fraction, symbol ratio. All pure array/regexp
    column expressions over the scan — no shuffle, no UDF; at 100 TB
    this runs at parquet-scan speed and feeds a quality filter."""
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n = F.size(words)
    tg = F.when(n >= 3, F.sequence(F.lit(1), n - 2)) \
          .otherwise(F.array().cast("array<int>"))
    trigrams = F.transform(tg, lambda i: F.array_join(F.slice(words, i, 3), " "))
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(1 - F.size(F.array_distinct(words)) / F.greatest(n, F.lit(1)), 4)
         .alias("dup_word_frac"),
        F.round(1 - F.size(F.array_distinct(trigrams))
                / F.greatest(F.size(trigrams), F.lit(1)), 4)
         .alias("dup_trigram_frac"),
        F.round(F.regexp_count(F.lower("text"), F.lit("[^a-z0-9 ]"))
                / F.greatest(F.length("text"), F.lit(1)), 4)
         .alias("symbol_ratio"))


_REPETITION_SQL = r"""
WITH w AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(lower(text)), '\s+') AS words
    FROM documents
)
SELECT doc_id,
       len(words) AS n_words,
       round(1 - len(list_distinct(words)) / greatest(len(words), 1), 4)
           AS dup_word_frac,
       round(1 - len(list_distinct(tg)) / greatest(len(tg), 1), 4)
           AS dup_trigram_frac,
       round(len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
             / greatest(length(text), 1), 4) AS symbol_ratio
FROM (
    SELECT doc_id, text, words,
           list_transform(generate_series(1, greatest(len(words) - 2, 0)),
                          i -> array_to_string(words[i:i+2], ' ')) AS tg
    FROM w
)
"""


# --------------------------------------------------------------------------
# pmi_collocations: PMI-ranked bigram phrase mining
# --------------------------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOPK = 20


def _pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information — the
    classic phrase-mining pass (Mikolov-style word2phrase) a corpus
    pipeline runs before tokenizer training to promote multi-word
    units. PMI = ln(c_xy·N²/(N_b·c_x·c_y)): every factor is an exact
    integer count, so the single ln sees the identical rational in
    both engines; ranking compares the ROUNDED score.

    Scale: bigrams are built array-side (zip of the token list with
    its own tail — no posexplode/window), so the only shuffles are the
    count aggregations (map-side combinable) and two unigram joins
    keyed on the word. The unigram side is the vocabulary — large at
    100 TB, so the joins stay keyed (sort-merge/AQE), never a
    broadcast of the vocab; the final top-k is TakeOrdered.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y))
    # all text-keyed shuffles ride the 16-byte unhex(md5(..)) key
    # (CLAUDE.md rule); the string itself survives via min() (all
    # values in a hash group are identical)
    uni = (docs.select(F.explode(toks).alias("w"))
           .where(F.col("w") != "")
           .groupBy(F.unhex(F.md5("w")).alias("wk"))
           .agg(F.count(F.lit(1)).alias("c_w"), F.min("w").alias("w")))
    bi = (docs.select(F.explode(grams).alias("bigram"))
          .groupBy(F.unhex(F.md5("bigram")).alias("bk"))
          .agg(F.count(F.lit(1)).alias("c_xy"),
               F.min("bigram").alias("bigram"))
          .where(F.col("c_xy") >= PMI_MIN_COUNT))
    totals = uni.agg(F.sum("c_w").alias("n_uni"),
                     F.count(F.lit(1)).alias("n_vocab"))
    n_bi = bi.agg(F.sum("c_xy").alias("n_bi"))
    w1 = F.split(F.col("bigram"), " ")[0]
    w2 = F.split(F.col("bigram"), " ")[1]
    joined = (bi.withColumn("w1k", F.unhex(F.md5(w1)))
              .withColumn("w2k", F.unhex(F.md5(w2)))
              .join(uni.select(F.col("wk").alias("w1k"),
                               F.col("c_w").alias("c_x")), "w1k")
              .join(uni.select(F.col("wk").alias("w2k"),
                               F.col("c_w").alias("c_y")), "w2k")
              .crossJoin(F.broadcast(totals))
              .crossJoin(F.broadcast(n_bi)))
    pmi = F.round(F.log(F.col("c_xy") * F.col("n_uni") * F.col("n_uni")
                        / (F.col("n_bi") * F.col("c_x") * F.col("c_y"))), 4)
    return (joined.select("bigram", "c_xy", "c_x", "c_y",
                          pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("bigram")).limit(PMI_TOPK))


_PMI_SQL = rf"""
WITH t AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
),
uni AS (
    SELECT unhex(md5(min(w))) AS wk, min(w) AS w, count(*) AS c_w
    FROM (SELECT unnest(toks) AS w FROM t) WHERE w <> ''
    GROUP BY unhex(md5(w))
),
bi AS (
    SELECT min(bigram) AS bigram, count(*) AS c_xy
    FROM (SELECT unnest(list_transform(
              generate_series(1, greatest(len(toks) - 1, 0)),
              i -> toks[i] || ' ' || toks[i + 1])) AS bigram
          FROM t)
    GROUP BY unhex(md5(bigram)) HAVING count(*) >= {PMI_MIN_COUNT}
),
totals AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_uni,
                  count(*) AS n_vocab FROM uni),
nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM bi)
SELECT bigram, c_xy, u1.c_w AS c_x, u2.c_w AS c_y,
       round(ln(c_xy * n_uni * n_uni
                / (n_bi * u1.c_w * u2.c_w)), 4) AS pmi
FROM bi
JOIN uni u1 ON u1.wk = unhex(md5(string_split(bigram, ' ')[1]))
JOIN uni u2 ON u2.wk = unhex(md5(string_split(bigram, ' ')[2]))
CROSS JOIN totals CROSS JOIN nb
ORDER BY pmi DESC, bigram ASC
LIMIT {PMI_TOPK}
"""


QUERIES = {
    "pmi_collocations": (_pmi_collocations, _PMI_SQL),
    "doc_token_stats": (_token_stats, _TOKEN_STATS_SQL),
    "pii_redaction": (_pii_redaction, _PII_SQL),
    "bpe_token_estimate": (_bpe_tokens, _BPE_SQL),
    "benchmark_decontamination": (_decontamination, _DECON_SQL),
    "doc_repetition_stats": (_repetition_stats, _REPETITION_SQL),
    "doc_chunking": (_doc_chunking, _CHUNKING_SQL),
    "sequence_packing": (_sequence_packing, _PACKING_SQL),
    "stratified_sample": (_stratified_sample, _STRATIFIED_SQL),
    "doc_lang_id": (_lang_id, _lang_id_sql()),
    "doc_quality_score": (_quality, _quality_sql()),
    "preference_pairs": (_preference_pairs, _preference_pairs_sql()),
    "quality_calibrated_by_source": (_quality_calibrated,
                                     _quality_calibrated_sql()),
    "lang_id_confusion": (_lang_id_confusion, _lang_id_confusion_sql()),
    "doc_fingerprint": (_fingerprint, _FINGERPRINT_SQL),
    "dataset_split": (_dataset_split, _SPLIT_SQL),
}


# ---------------------------------------------------------------------------
# RAKE keyword extraction (degree/frequency over stopword-split phrases)
# ---------------------------------------------------------------------------
_RAKE_STOPS = "(a|the|of|and|is)"
_RAKE_TOPK = 20


def _rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scores: split docs into phrases at stopwords,
    score each word by degree/frequency (degree = Σ length of phrases
    containing it) — the classic unsupervised keyword extractor, fully
    JVM-side (regex + explode, no UDF).

    Stopword removal is TWO identical regexp_replace passes: a global
    leftmost replace consumes the trailing space of a match, so a run
    of adjacent stopwords loses only alternate members per pass; after
    pass one the survivors are always separated, so pass two is
    complete. Same non-overlapping leftmost semantics in Java regex
    and RE2 — identical output. Scores are exact integer rationals
    floored at e6 (no float ranking); top-20 with word tie-break.

    Scale: one scan → explode to (word, phrase_len) → one keyed
    aggregate over the vocabulary; TakeOrdered top-20. Phrase
    reconstruction is string-level (codegen), never a Python UDF."""
    docs = load(spark, sf_dir, "documents")
    joined = F.concat(F.lit(" "),
                      F.array_join(F.split(F.trim(F.lower(F.col("text"))),
                                           r"\s+"), " "),
                      F.lit(" "))
    pat = f" {_RAKE_STOPS} "
    cut = F.regexp_replace(F.regexp_replace(joined, pat, " | "),
                           pat, " | ")
    phrases = (docs.select(F.explode(F.split(cut, r"\|")).alias("ph"))
               .select(F.trim("ph").alias("ph"))
               .where(F.col("ph") != ""))
    words = phrases.select(
        F.explode(F.split("ph", " ")).alias("word"),
        F.size(F.split("ph", " ")).cast("long").alias("plen"))
    scored = (words.groupBy("word")
              .agg(F.count(F.lit(1)).alias("freq"),
                   F.sum("plen").alias("degree"))
              .select("word", "freq", "degree",
                      F.floor(F.lit(1_000_000) * F.col("degree")
                              / F.col("freq")).cast("long")
                       .alias("score_e6")))
    return (scored.orderBy(F.desc("score_e6"), F.asc("word"))
            .limit(_RAKE_TOPK))


_RAKE_SQL = rf"""
WITH joined AS (
  SELECT ' ' || array_to_string(regexp_split_to_array(trim(lower(text)),
                                                      '\s+'), ' ') || ' '
             AS s
  FROM documents
), cut AS (
  SELECT regexp_replace(regexp_replace(s, ' {_RAKE_STOPS} ', ' | ', 'g'),
                        ' {_RAKE_STOPS} ', ' | ', 'g') AS s2
  FROM joined
), phrases AS (
  SELECT trim(u) AS ph
  FROM cut, unnest(string_split(s2, '|')) AS t(u)
), nonempty AS (
  SELECT ph FROM phrases WHERE ph <> ''
), words AS (
  SELECT unnest(regexp_split_to_array(ph, ' ')) AS word,
         CAST(len(regexp_split_to_array(ph, ' ')) AS BIGINT) AS plen
  FROM nonempty
)
SELECT word, CAST(count(*) AS BIGINT) AS freq,
       CAST(sum(plen) AS BIGINT) AS degree,
       CAST(floor(1000000 * CAST(sum(plen) AS BIGINT)
                  / CAST(count(*) AS DOUBLE)) AS BIGINT) AS score_e6
FROM words
GROUP BY word
ORDER BY score_e6 DESC, word ASC
LIMIT {_RAKE_TOPK}
"""

QUERIES["rake_keywords"] = (_rake_keywords, _RAKE_SQL)


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate of the held-out split against the train vocab
# ---------------------------------------------------------------------------


def _oov_rate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out OOV audit: build the token vocabulary from the 80%
    train split (doc_id % 5 != 0 — the same split every train/test
    operator here uses) and measure, per language, how much of the
    held-out token mass falls outside it — the number that predicts
    tokenizer-fallback blowup and <unk> pollution before a vocabulary
    is frozen, and per-language because low-resource slices are where
    OOV hides when the aggregate looks fine.

    Determinism: exact counts; token identity travels as
    ``unhex(md5(token))`` (the fixed-width key rule) in both engines.

    Scale: vocab is one distinct over 16-byte keys; the membership
    probe is a left anti/semi join of test tokens against it — both
    sides keyed on the same fixed-width hash, map-side combinable on
    the counting side. At 100 TB the vocab side is vocabulary-sized
    (Zipf-bounded), so the join broadcasts or at worst buckets; the
    corpus never shuffles text.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = lambda df: (df.select(  # noqa: E731
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .withColumn("wk", F.unhex(F.md5("w"))))
    vocab = (tok(docs.where(F.col("doc_id") % 5 != 0))
             .select("wk").distinct())
    test = tok(docs.where(F.col("doc_id") % 5 == 0))
    oov = (test.join(vocab, "wk", "left_anti")
           .groupBy("lang").agg(F.count(F.lit(1)).alias("n_oov")))
    totals = test.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (totals.join(oov, "lang", "left")
            .select("lang", "n_tokens",
                    F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                    F.round(F.coalesce("n_oov", F.lit(0))
                            / F.col("n_tokens"), 4).alias("oov_rate")))


_OOV_SQL = r"""
WITH tok AS (
    SELECT doc_id, lang, unhex(md5(w)) AS wk
    FROM (SELECT doc_id, lang,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents)
    WHERE w <> ''
),
vocab AS (SELECT DISTINCT wk FROM tok WHERE doc_id % 5 <> 0),
test AS (SELECT lang, wk FROM tok WHERE doc_id % 5 = 0),
oov AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_oov
    FROM test t
    WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.wk = t.wk)
    GROUP BY lang
),
totals AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens
           FROM test GROUP BY lang)
SELECT t.lang, t.n_tokens,
       coalesce(o.n_oov, 0) AS n_oov,
       round(coalesce(o.n_oov, 0) / t.n_tokens, 4) AS oov_rate
FROM totals t LEFT JOIN oov o USING (lang)
"""

QUERIES["oov_rate_eval"] = (_oov_rate_eval, _OOV_SQL)


# ---------------------------------------------------------------------------
# Per-document character-entropy profile (gibberish / encoded-blob signal)
# ---------------------------------------------------------------------------


def _char_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution (nats,
    e6 fixed-point) plus alphabet size — the cheap information-theoretic
    screen that separates natural text (moderate entropy, small
    alphabet) from base64/hex blobs (high entropy) and from
    stuck-key/padding junk (near-zero entropy), run before any
    model-based quality score because it needs nothing but bytes.

    Determinism: H = Σ c·lnq(n/c) / n with lnq = round(1e6·ln(n/c)) —
    the ln is the only transcendental and is quantized immediately
    (the naive-Bayes recipe), so the outer sum and the final integer
    division are exact.

    Scale: the char explode is the big fan-out (n_chars rows/doc) but
    the (doc_id, char) count is map-side combined down to alphabet
    size per doc per partition before the one shuffle; everything
    after is |docs|-sized. A production variant would fold the
    histogram per-partition in a pandas UDF to skip the explode —
    same result, this shape keeps the oracle exact.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    chars = (docs.select("doc_id",
                         F.explode(F.split("text", "")).alias("ch"))
             .where(F.col("ch") != ""))
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c"))
    counts = counts.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id")))
    per_doc = counts.groupBy("doc_id").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(F.col("c")
              * F.round(F.lit(1_000_000)
                        * F.log(F.col("n") / F.col("c")), 0)
              .cast("long")).alias("h_sum"))
    return per_doc.select(
        "doc_id", F.col("n").alias("n_chars_counted"), "n_distinct_chars",
        F.expr("h_sum div n").alias("entropy_e6"))


_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                         i -> text[i]))  AS ch
    FROM documents
),
counts AS (
    SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
    FROM chars GROUP BY doc_id, ch
),
with_n AS (
    SELECT doc_id, ch, c,
           CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
    FROM counts
),
per_doc AS (
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(sum(c * CAST(round(1000000 * ln(n / c), 0)
                 AS BIGINT)) AS BIGINT) AS h_sum
    FROM with_n GROUP BY doc_id
)
SELECT doc_id, n AS n_chars_counted, n_distinct_chars,
       h_sum // n AS entropy_e6
FROM per_doc
"""

QUERIES["char_entropy_profile"] = (_char_entropy_profile, _ENTROPY_SQL)


# ---------------------------------------------------------------------------
# packing_efficiency_audit: next-fit-decreasing bins vs the LP bound
# ---------------------------------------------------------------------------

def _packing_efficiency_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """How much context window does document-intact packing waste?
    Pack each language stream with next-fit-DECREASING (docs sorted by
    token count descending, one open bin — the sequential policy a
    streaming packer actually runs) and compare the bin count to the
    ceil(total/budget) LP lower bound. Output per language: (lang,
    n_docs, total_tokens, lb_bins, nfd_bins, efficiency_e6,
    frag_tokens).

    Determinism: the packing state is a (bins, fill) fold over the
    (tokens DESC, doc_id) sorted array — exact integers; the struct
    accumulator's bins field is written before fill and neither reads
    the other's NEW value (in-place rule). Docs longer than the
    budget get a bin each (their overflow spills — counted, not
    dropped).

    Scale: one scan to (lang, doc tokens), a per-language sorted fold
    over document counts — the fold is per-stream sequential exactly
    like the packer it models; streams, not the corpus, parallelize.
    """
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    toks = docs.select("lang", "doc_id", n_tok.cast("long").alias("nt"))
    arr = (toks.groupBy("lang")
           .agg(F.array_sort(F.collect_list(
               F.struct((-F.col("nt")).alias("negt"),
                        F.col("doc_id").alias("d"),
                        F.col("nt").alias("nt")))).alias("xs"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("total_tokens")))
    fold = (f"aggregate(xs, named_struct('bins', cast(0 as bigint),"
            f" 'fill', cast({_PACK_BUDGET} as bigint)),"
            " (acc, e) -> named_struct("
            f"'bins', acc.bins + (case when acc.fill + e.nt"
            f" > {_PACK_BUDGET} then 1 else 0 end),"
            f" 'fill', case when acc.fill + e.nt > {_PACK_BUDGET}"
            " then e.nt else acc.fill + e.nt end))")
    return arr.select(
        "lang", "n_docs", "total_tokens",
        F.expr(f"(total_tokens + {_PACK_BUDGET} - 1)"
               f" div {_PACK_BUDGET}").alias("lb_bins"),
        F.expr(f"({fold}).bins").alias("nfd_bins"),
        F.expr(f"case when ({fold}).bins = 0 then cast(0 as bigint)"
               f" else 1000000 * ((total_tokens + {_PACK_BUDGET} - 1)"
               f" div {_PACK_BUDGET}) div ({fold}).bins end")
         .alias("efficiency_e6"),
        F.expr(f"({fold}).bins * {_PACK_BUDGET} - total_tokens")
         .alias("frag_tokens"))


_PACK_EFF_SQL = f"""
WITH toks AS (
    SELECT lang, doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS nt
    FROM documents
),
arr AS (
    SELECT lang,
           list_sort(list(struct_pack(negt := -nt, d := doc_id,
                                      nt := nt))) AS xs,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens
    FROM toks GROUP BY lang
),
folded AS (
    SELECT lang, n_docs, total_tokens,
           list_reduce(list_prepend(
               struct_pack(bins := CAST(0 AS BIGINT),
                           fill := CAST({_PACK_BUDGET} AS BIGINT)),
               list_transform(xs, e -> struct_pack(
                   bins := CAST(0 AS BIGINT), fill := e.nt))),
               (acc, e) -> struct_pack(
                   bins := acc.bins + (CASE WHEN acc.fill + e.fill
                       > {_PACK_BUDGET} THEN 1 ELSE 0 END),
                   fill := CASE WHEN acc.fill + e.fill
                       > {_PACK_BUDGET} THEN e.fill
                       ELSE acc.fill + e.fill END)) AS st
    FROM arr
)
SELECT lang, n_docs, total_tokens,
       (total_tokens + {_PACK_BUDGET} - 1) // {_PACK_BUDGET} AS lb_bins,
       st.bins AS nfd_bins,
       CASE WHEN st.bins = 0 THEN CAST(0 AS BIGINT)
            ELSE 1000000 * ((total_tokens + {_PACK_BUDGET} - 1)
                 // {_PACK_BUDGET}) // st.bins END AS efficiency_e6,
       st.bins * {_PACK_BUDGET} - total_tokens AS frag_tokens
FROM folded
"""

QUERIES["packing_efficiency_audit"] = (_packing_efficiency_audit,
                                       _PACK_EFF_SQL)


# --------------------------------------------------------------------------
# readability_scores: Flesch-Kincaid style grade from integer counts
# --------------------------------------------------------------------------


def _readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid-style readability per document — the grade-level
    screen a curation pipeline uses to route documents into difficulty
    tiers (curriculum ordering) or drop degenerate text. Inputs are
    three exact integer counts: words (whitespace tokens), sentences
    (runs of [.!?], min 1), and syllables (vowel GROUPS [aeiouy]+ per
    word, the standard heuristic), all via the same regexes in both
    engines on the ASCII corpus.

    Grade is kept in integer milli-units with PER-TERM floors (summing
    floors, not flooring a sum, so both engines agree):
    ``grade_e3 = floor(390·words/sentences) + floor(11800·syll/words)
    − 15590`` — the FK coefficients x1000.

    Scale: pure per-row column arithmetic — one corpus scan, zero
    shuffles; the regex work is JVM codegen, no Python anywhere.
    """
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    low = F.trim(F.lower(F.col("text")))
    words = F.size(F.split(low, r"\s+"))
    # sentence runs: count [.!?]+ groups; at least 1
    sent = F.greatest(
        F.lit(1),
        F.size(F.split(F.regexp_replace(low, r"[.!?]+", "#"), "#")) - 1)
    # vowel groups across the doc ~ syllables (per the usual heuristic)
    syl = F.greatest(
        F.lit(1),
        F.size(F.split(F.regexp_replace(low, r"[aeiouy]+", "#"), "#")) - 1)
    return (docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sent.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"))
        .select("doc_id", "n_words", "n_sentences", "n_syllables",
                (F.expr("(390 * n_words) div n_sentences")
                 + F.expr("(11800 * n_syllables) div n_words")
                 - 15590).alias("fk_grade_e3")))


_READABILITY_SQL = r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS BIGINT) AS n_words,
         CAST(greatest(1, len(string_split(
             regexp_replace(trim(lower(text)), '[.!?]+', '#', 'g'), '#'))
             - 1) AS BIGINT) AS n_sentences,
         CAST(greatest(1, len(string_split(
             regexp_replace(trim(lower(text)), '[aeiouy]+', '#', 'g'), '#'))
             - 1) AS BIGINT) AS n_syllables
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (390 * n_words) // n_sentences
       + (11800 * n_syllables) // n_words - 15590 AS fk_grade_e3
FROM c
"""

QUERIES["readability_scores"] = (_readability_scores, _READABILITY_SQL)


# --------------------------------------------------------------------------
# burrows_delta: stylometric distance between sources over function words
# --------------------------------------------------------------------------

_DELTA_TOPW = 20  # most-frequent corpus words = the function-word panel


def _burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of sources: the classic
    stylometry / authorship-attribution distance — mean absolute
    difference of z-scored relative frequencies of the corpus's top
    function words. In a curation pipeline this is the "do these two
    crawls write alike" screen that catches template farms and
    mirrored sites sharing style but not content (content overlap is
    the dedup family's job).

    Determinism: per-source relative frequencies are exact integers
    ``f_e6 = c·1e6 div T``; per-word variance rides exact int64
    moments (``var25 = n·Σf² − (Σf)²``); each pair term is ONE double
    expression ``5·|f_a − f_b| / sqrt(var25)`` (IEEE-exact), and the
    cross-word sum is a LEFT FOLD over the word-sorted term list
    (CLAUDE.md float-reduction rule — never an engine-default sum
    association), then round(6). Uniform words (var25 = 0) contribute
    0 in both engines.

    Scale: one token explode → (word, source) counts on md5 keys
    (map-side combinable; source totals reduce from the SAME counts
    frame, so the corpus is exploded once); the panel is a TakeOrdered
    top-20; all
    z/pair math runs on the panel×sources frame (~100 rows at any
    corpus size). int64 headroom: f_e6 ≤ 1e6 so Σf² ≤ n·1e12 and
    n·Σf² ≤ n²·1e12 — holds to n ≈ 3000 sources (the e9 scale capped
    out at ~9 sources while the corpus has 20; a skewed source could
    overflow int64, wrapping in Spark but raising in DuckDB — ADVICE
    r05).
    """
    docs = load(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                          r"\s+")).alias("w"))
            .where(F.col("w") != ""))
    counts = (toks.groupBy(F.unhex(F.md5("w")).alias("wk"), "source")
              .agg(F.count(F.lit(1)).alias("c"), F.min("w").alias("w")))
    top = (counts.groupBy("wk")
           .agg(F.sum("c").alias("ctot"), F.min("w").alias("w"))
           .orderBy(F.desc("ctot"), "w").limit(_DELTA_TOPW)
           .select("wk", "w"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    grid = (F.broadcast(top).crossJoin(totals)
            .join(counts.select("wk", "source", "c"), ["wk", "source"],
                  "left")
            .select("w", "source",
                    F.expr("coalesce(c, 0) * 1000000 div t")
                    .alias("f")))
    sig = (grid.groupBy("w")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("f").alias("sf"),
                F.sum(F.col("f") * F.col("f")).alias("sff"))
           .select(F.col("w").alias("sw"),
                   (F.col("n") * F.col("sff")
                    - F.col("sf") * F.col("sf")).alias("var25")))
    a, b = grid.alias("a"), grid.alias("b")
    terms = (a.join(b, (F.col("a.w") == F.col("b.w"))
                    & (F.col("a.source") < F.col("b.source")))
             .join(sig, F.col("a.w") == F.col("sw"))
             .select(F.col("a.source").alias("src_a"),
                     F.col("b.source").alias("src_b"),
                     F.col("a.w").alias("word"),
                     F.expr("CASE WHEN var25 = 0 THEN 0.0"
                            " ELSE 5 * abs(a.f - b.f) / sqrt(var25) END")
                     .alias("term")))
    return (terms.groupBy("src_a", "src_b")
            .agg(F.array_sort(F.collect_list(F.struct("word", "term")))
                 .alias("xs"))
            .select("src_a", "src_b",
                    F.round(F.expr(
                        "aggregate(xs, 0.0d, (acc, x) -> acc + x.term)")
                        / _DELTA_TOPW, 6).alias("delta_r6")))


_BURROWS_SQL = rf"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             AS w
  FROM documents
),
toks_ne AS (SELECT source, w FROM toks WHERE w <> ''),
counts AS (
  SELECT unhex(md5(min(w))) AS wk, source, min(w) AS w,
         CAST(count(*) AS BIGINT) AS c
  FROM toks_ne GROUP BY unhex(md5(w)), source
),
top AS (
  SELECT wk, min(w) AS w
  FROM counts GROUP BY wk
  ORDER BY CAST(sum(c) AS BIGINT) DESC, min(w) ASC
  LIMIT {_DELTA_TOPW}
),
totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
           FROM counts GROUP BY source),
grid AS (
  SELECT top.w, totals.source,
         coalesce(c.c, 0) * 1000000 // totals.t AS f
  FROM top CROSS JOIN totals
  LEFT JOIN counts c ON c.wk = top.wk AND c.source = totals.source
),
sig AS (
  SELECT w, CAST(count(*) AS BIGINT) * CAST(sum(f * f) AS BIGINT)
            - CAST(sum(f) AS BIGINT) * CAST(sum(f) AS BIGINT) AS var25
  FROM grid GROUP BY w
),
terms AS (
  SELECT a.source AS src_a, b.source AS src_b, a.w AS word,
         CASE WHEN s.var25 = 0 THEN 0.0
              ELSE 5 * abs(a.f - b.f) / sqrt(s.var25) END AS term
  FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source
  JOIN sig s ON s.w = a.w
)
SELECT src_a, src_b,
       round(list_reduce(list_prepend(
                 0.0, list_transform(
                     list_sort(list(struct_pack(w := word, t := term))),
                     x -> x.t)),
             (acc, x) -> acc + x) / {_DELTA_TOPW}, 6) AS delta_r6
FROM terms GROUP BY src_a, src_b
"""

QUERIES["burrows_delta"] = (_burrows_delta, _BURROWS_SQL)


# --------------------------------------------------------------------------
# vocab_overlap_matrix: lexical Jaccard between sources
# --------------------------------------------------------------------------


def _vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the LEXICON
    overlap companion to burrows_delta (style) and
    cross_source_dup_matrix (verbatim documents): two crawls can share
    zero documents yet 95% of their vocabulary (same domain), or share
    style but disjoint jargon. Corpus mixing decisions read all three.

    Determinism: distinct vocabularies on md5 keys, exact integer
    intersection/union, e6 floors.

    Scale: one token explode → per-source distinct vocab (md5-keyed,
    map-side combinable); the intersection self-join is keyed on the
    16-byte word hash, so cost is Σ df² over words — bounded by the
    source count, not the corpus. Output is |sources|² rows.
    """
    docs = load(spark, sf_dir, "documents")
    vocab = (docs.select("source",
                         F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                           r"\s+")).alias("w"))
             .where(F.col("w") != "")
             .select("source", F.unhex(F.md5("w")).alias("wk"))
             .distinct())
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (a.join(b, (F.col("a.wk") == F.col("b.wk"))
                    & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("src_a"),
                      F.col("b.source").alias("src_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("source").alias("src_a"),
                      F.col("v").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("src_b"),
                      F.col("v").alias("vocab_b"))
    return (inter.join(sa, "src_a").join(sb, "src_b")
            .select("src_a", "src_b", "vocab_a", "vocab_b", "n_inter",
                    F.expr("n_inter * 1000000"
                           " div (vocab_a + vocab_b - n_inter)")
                    .alias("jaccard_e6")))


_VOCAB_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
),
vocab AS (
  SELECT DISTINCT source, unhex(md5(w)) AS wk FROM toks WHERE w <> ''
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v
          FROM vocab GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM vocab a JOIN vocab b ON a.wk = b.wk AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, sa.v AS vocab_a, sb.v AS vocab_b, i.n_inter,
       i.n_inter * 1000000 // (sa.v + sb.v - i.n_inter) AS jaccard_e6
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
"""

QUERIES["vocab_overlap_matrix"] = (_vocab_overlap_matrix,
                                   _VOCAB_OVERLAP_SQL)


# --------------------------------------------------------------------------
# lexicon_sentiment_score: broadcast-lexicon polarity scoring
# --------------------------------------------------------------------------

# Fixed public word lists (the large-scale-sentiment-on-Spark shape,
# EDBT 2016 — PAPERS.md: lexicon lookup beats model inference when the
# corpus is 100 TB and the lexicon is KBs).
_SENT_POS = ("fast", "small", "value", "merge")
_SENT_NEG = ("slow", "big", "dup", "error")


def _lexicon_sentiment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexicon polarity: token hits against fixed
    positive/negative word lists, polarity_e6 = 1e6·(pos − neg) div
    tokens — the classic distributed sentiment pass (EDBT 2016,
    PAPERS.md) and, in a curation stack, the cheap affect/tone feature
    that rides the same scan as the other doc-quality signals.

    Determinism: exact integer counts and one integer division; the
    lexicon is inlined identically in both engines.

    Scale: zero shuffles — the lexicon folds into the scan as literal
    array_contains tests (no join at all: a KB lexicon beats even a
    broadcast join since it never leaves codegen).
    """
    docs = load(spark, sf_dir, "documents")
    pos = ", ".join(f"'{w}'" for w in _SENT_POS)
    neg = ", ".join(f"'{w}'" for w in _SENT_NEG)
    toks = "filter(split(trim(lower(text)), '\\\\s+'), w -> w <> '')"
    return docs.select(
        "doc_id", "source",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(filter({toks}, w -> w IN ({pos})))"
               ).alias("n_pos"),
        F.expr(f"size(filter({toks}, w -> w IN ({neg})))"
               ).alias("n_neg")).withColumn(
        "polarity_e6",
        F.expr("CASE WHEN n_tokens = 0 THEN 0 ELSE"
               " 1000000 * (cast(n_pos as bigint) - n_neg)"
               " div n_tokens END"))


def _lexicon_sentiment_sql() -> str:
    pos = ", ".join(f"'{w}'" for w in _SENT_POS)
    neg = ", ".join(f"'{w}'" for w in _SENT_NEG)
    return rf"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
)
SELECT doc_id, source,
       CAST(len(ws) AS INT) AS n_tokens,
       CAST(len(list_filter(ws, w -> w IN ({pos}))) AS INT) AS n_pos,
       CAST(len(list_filter(ws, w -> w IN ({neg}))) AS INT) AS n_neg,
       CASE WHEN len(ws) = 0 THEN 0
            ELSE 1000000 * (CAST(len(list_filter(ws, w -> w IN ({pos})))
                                 AS BIGINT)
                            - len(list_filter(ws, w -> w IN ({neg}))))
                 // len(ws) END AS polarity_e6
FROM toks
"""


QUERIES["lexicon_sentiment_score"] = (_lexicon_sentiment_score,
                                      _lexicon_sentiment_sql())


# --------------------------------------------------------------------------
# cohens_kappa_agreement: chance-corrected classifier agreement
# --------------------------------------------------------------------------

def _cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the n-gram language-ID heuristic and the
    gold ``lang`` labels — the chance-corrected scalar the confusion
    matrix (lang_id_confusion) doesn't give: raw accuracy flatters a
    classifier on a skewed label mix; kappa subtracts the agreement a
    label-marginal-matching random rater would get.

    Determinism: kappa = (N·Σdiag − Σ row_k·col_k) / (N² − Σ row·col)
    — every term an exact int64, emitted as e6 fixed point with the
    degenerate pe=1 case (single-class corpus) mapped to 0.

    Scale: one scan-fused prediction pass, one map-side-combinable
    |langs|²-cell aggregate; everything after runs on ≤ 16 rows.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.col("lang").alias("t"), T.lang_id(F.col("text")).alias("p"))
    cells = docs.groupBy("t", "p").agg(F.count(F.lit(1)).alias("n"))
    rows_ = cells.groupBy("t").agg(F.sum("n").alias("rn"))
    cols_ = cells.groupBy("p").agg(F.sum("n").alias("cn"))
    rc = (rows_.join(cols_, rows_["t"] == cols_["p"])
          .agg(F.sum(F.col("rn") * F.col("cn")).alias("sum_rc")))
    agg = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("t") == F.col("p"), F.col("n"))
              .otherwise(F.lit(0))).alias("sum_diag"))
    return (agg.crossJoin(F.broadcast(rc))
            .select("n_docs", "sum_diag",
                    F.coalesce("sum_rc", F.lit(0)).alias("sum_rc"))
            .withColumn("kappa_e6", F.expr(
                "CASE WHEN n_docs * n_docs - sum_rc = 0 THEN 0"
                " ELSE 1000000 * (n_docs * sum_diag - sum_rc)"
                " div (n_docs * n_docs - sum_rc) END")))


def _cohens_kappa_sql() -> str:
    return f"""
WITH {_pred_cte()},
cells AS (
  SELECT true_lang AS t, pred_lang AS p, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
r AS (SELECT t, CAST(sum(n) AS BIGINT) AS rn FROM cells GROUP BY t),
c AS (SELECT p, CAST(sum(n) AS BIGINT) AS cn FROM cells GROUP BY p),
rc AS (SELECT CAST(sum(rn * cn) AS BIGINT) AS sum_rc
       FROM r JOIN c ON r.t = c.p),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT)
             AS sum_diag
  FROM cells
)
SELECT n_docs, sum_diag, coalesce(sum_rc, 0) AS sum_rc,
       CASE WHEN n_docs * n_docs - coalesce(sum_rc, 0) = 0 THEN 0
            ELSE 1000000 * (n_docs * sum_diag - coalesce(sum_rc, 0))
                 // (n_docs * n_docs - coalesce(sum_rc, 0)) END
           AS kappa_e6
FROM agg, rc
"""


QUERIES["cohens_kappa_agreement"] = (_cohens_kappa_agreement,
                                     _cohens_kappa_sql())


# --------------------------------------------------------------------------
# source_ablation_value: leave-one-source-out corpus-metric deltas
# --------------------------------------------------------------------------

def _source_ablation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data valuation by ablation: for every source, how the corpus-
    level health metrics move when that source is REMOVED — the
    leave-one-out signal a mixture tuner reads before reweighting
    (the per-source twin of the quality-filter ablation lattice).
    Metrics: mean tokens per doc and share of short docs (< 64
    chars), both exact integers.

    Determinism: LOO means are pure sum-subtraction on int64 totals
    ((tot − s) div (n − m)); no metric is recomputed per ablation, so
    there is exactly ONE corpus pass for S sources (vs the naive S+1
    passes).

    Scale: one map-side-combinable per-source aggregate; the LOO
    algebra runs on |sources| rows against a broadcast 1-row total.
    """
    docs = load(spark, sf_dir, "documents")
    per = (docs.select(
        "source",
        F.expr("size(filter(split(trim(lower(text)), '\\\\s+'),"
               " w -> w <> ''))").cast("long").alias("tok"),
        (F.col("n_chars") < 64).cast("long").alias("short"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("m"),
             F.sum("tok").alias("s_tok"),
             F.sum("short").alias("s_short")))
    tot = per.agg(F.sum("m").alias("n"), F.sum("s_tok").alias("t_tok"),
                  F.sum("s_short").alias("t_short"))
    return (per.crossJoin(F.broadcast(tot))
            .select(
                "source", F.col("m").alias("n_docs"),
                F.expr("1000000 * t_tok div n").alias("mean_tok_all_e6"),
                F.expr("CASE WHEN n - m = 0 THEN 0 ELSE"
                       " 1000000 * (t_tok - s_tok) div (n - m) END")
                .alias("mean_tok_loo_e6"),
                F.expr("1000000 * t_short div n").alias("short_all_e6"),
                F.expr("CASE WHEN n - m = 0 THEN 0 ELSE"
                       " 1000000 * (t_short - s_short) div (n - m) END")
                .alias("short_loo_e6"))
            .withColumn("tok_delta_e6", F.expr(
                "mean_tok_loo_e6 - mean_tok_all_e6"))
            .withColumn("short_delta_e6", F.expr(
                "short_loo_e6 - short_all_e6")))


_SOURCE_ABLATION_SQL = r"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(len(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             w -> w <> ''))) AS BIGINT) AS s_tok,
         CAST(sum(CASE WHEN n_chars < 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS s_short
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(m) AS BIGINT) AS n,
               CAST(sum(s_tok) AS BIGINT) AS t_tok,
               CAST(sum(s_short) AS BIGINT) AS t_short FROM per)
SELECT source, m AS n_docs,
       1000000 * t_tok // n AS mean_tok_all_e6,
       CASE WHEN n - m = 0 THEN 0
            ELSE 1000000 * (t_tok - s_tok) // (n - m) END
           AS mean_tok_loo_e6,
       1000000 * t_short // n AS short_all_e6,
       CASE WHEN n - m = 0 THEN 0
            ELSE 1000000 * (t_short - s_short) // (n - m) END
           AS short_loo_e6,
       (CASE WHEN n - m = 0 THEN 0
             ELSE 1000000 * (t_tok - s_tok) // (n - m) END)
           - 1000000 * t_tok // n AS tok_delta_e6,
       (CASE WHEN n - m = 0 THEN 0
             ELSE 1000000 * (t_short - s_short) // (n - m) END)
           - 1000000 * t_short // n AS short_delta_e6
FROM per, tot
"""


QUERIES["source_ablation_value"] = (_source_ablation_value,
                                    _SOURCE_ABLATION_SQL)
