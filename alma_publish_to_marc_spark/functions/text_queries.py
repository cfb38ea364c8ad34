"""Oracle-checked text-analysis queries over the `documents` table.

The DuckDB SQL mirrors the Spark expressions primitive-for-primitive
(same tokenization, same rolling hash, same arithmetic order) so values
hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def _quality_sql() -> str:
    en = _marker_sql(T.LANG_MARKERS["en"])
    toks = SQL_TOKS
    atl = (f"round(list_reduce(list_prepend(CAST(0 AS BIGINT), "
           f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), "
           f"(a, b) -> a + b) / greatest(len({toks}), 1), 4)")
    punct = ("round(len(list_filter(string_split(text, ''), "
             "c -> list_contains(['.', ',', ';', ':', '!', '?'], c))) "
             "/ greatest(length(text), 1), 4)")
    stop = f"round({en} / greatest(len({toks}), 1), 4)"
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


QUERIES = {
    "doc_token_stats": (_token_stats, _TOKEN_STATS_SQL),
    "doc_chunking": (_doc_chunking, _CHUNKING_SQL),
    "sequence_packing": (_sequence_packing, _PACKING_SQL),
    "stratified_sample": (_stratified_sample, _STRATIFIED_SQL),
    "doc_lang_id": (_lang_id, _lang_id_sql()),
    "doc_quality_score": (_quality, _quality_sql()),
    "doc_fingerprint": (_fingerprint, _FINGERPRINT_SQL),
    "dataset_split": (_dataset_split, _SPLIT_SQL),
}
