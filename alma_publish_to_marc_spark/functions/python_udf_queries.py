"""The Python-execution surface (SURVEY.md §2.10) exercised as
oracle-checked queries: a lateral-join Python UDTF (the literal Spark
form of the reference's 1→N record expansion, OP-U3,
`alma_publish_parser.py:91-189`) and a grouped-map applyInPandas stage
(OP-U2's pluggable record-processor slot).

Both oracles are exact-integer so the Arrow boundary can't introduce
float drift. The UDTF chunker reuses the sliding-window contract of
``doc_chunking`` — same oracle SQL, so the Catalyst-native and
Python-native implementations are mutually checked against one truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from .text_queries import _CHUNK, _CHUNKING_SQL, _STRIDE


def _chunk_rows(doc_id, lang, text):
    """Shared generator: one (chunk_idx, chunk_text) per stride window;
    empty text still yields its single empty chunk (greatest(L,1))."""
    length = max(len(text), 1)
    start, idx = 0, 0
    while start < length:
        chunk = text[start:start + _CHUNK]
        yield doc_id, lang, idx, chunk, len(chunk)
        start += _STRIDE
        idx += 1


def _doc_chunking_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rows as ``doc_chunking`` but produced by a Python UDTF in a
    LATERAL join — the row-expanding escape hatch for logic Catalyst
    can't express (real tokenizers, decoders). Arrow-batched; scales as
    a narrow stage like the native version, at Python-worker cost."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=("doc_id: bigint, lang: string, chunk_idx: int, "
                      "chunk_text: string, chunk_len: int"))
    class ChunkUDTF:
        def eval(self, doc_id, lang, text):  # noqa: ANN001 — UDTF contract
            yield from _chunk_rows(doc_id, lang, text)

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT c.doc_id, c.lang, c.chunk_idx, c.chunk_text, c.chunk_len
        FROM udtf_docs, LATERAL chunk_udtf(doc_id, lang, text) c
    """)


def _grouped_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each language stratum arrives as ONE
    pandas frame (Arrow batch), ranked locally. The deterministic sort
    inside the worker is what makes a Python group-processor
    reproducible under Spark's unordered shuffle delivery."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def rank_stratum(pdf):
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pdf["lang_rank"] = range(1, len(pdf) + 1)
        return pdf

    return docs.groupBy("lang").applyInPandas(
        rank_stratum,
        schema="doc_id bigint, lang string, n_chars bigint, lang_rank bigint")


_GROUPED_RANK_SQL = """
SELECT doc_id, lang, n_chars,
       row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS lang_rank
FROM documents
"""


QUERIES = {
    "doc_chunking_udtf": (_doc_chunking_udtf, _CHUNKING_SQL),
    "grouped_rank_pandas": (_grouped_rank, _GROUPED_RANK_SQL),
}
