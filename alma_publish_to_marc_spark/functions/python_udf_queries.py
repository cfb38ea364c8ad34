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


def _cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: orders and customers co-shuffled on
    custkey arrive as TWO pandas frames per key group — the two-input
    Python escape hatch (custom reconciliation, fuzzy matching,
    model-based entity merge). Here the worker reconciles order counts
    and exact cents per customer, emitting customers with no orders
    (n_orders 0) and orphan order keys alike — full-outer semantics a
    single-input grouped map can't express.

    Determinism: integer counts/cents summed in int64 pandas; one
    output row per key, no intra-group order dependence.

    Scale: ONE co-partitioned shuffle of both sides (same hash
    partitioning Catalyst would use for the join); worker state is one
    group at a time. The SQL twin is the full-outer aggregate join.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    def reconcile(key, left, right):
        (custkey,) = key
        return pd.DataFrame({
            "custkey": [int(custkey)],
            "n_orders": [int(len(left))],
            "total_cents": [int(left["cents"].sum()) if len(left) else 0],
            "has_customer": [1 if len(right) else 0],
        })

    return (orders.groupBy("o_custkey")
            .cogroup(cust.groupBy("c_custkey"))
            .applyInPandas(reconcile,
                           schema="custkey bigint, n_orders bigint, "
                                  "total_cents bigint, has_customer int"))


_COGROUP_SQL = """
WITH o AS (
    SELECT o_custkey AS custkey, count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
    FROM orders GROUP BY 1
),
c AS (SELECT c_custkey AS custkey FROM customer)
SELECT coalesce(o.custkey, c.custkey) AS custkey,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(o.total_cents, 0) AS BIGINT) AS total_cents,
       CAST(CASE WHEN c.custkey IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS has_customer
FROM o FULL OUTER JOIN c ON o.custkey = c.custkey
"""


def _arrow_batch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: zero-copy pyarrow RecordBatches straight into Python
    — the lowest-overhead Python seam (below pandas conversion), the
    right tier for byte-level feature extraction over 100 TB of text.
    Features are exact integers computed with pyarrow.compute kernels
    (no Python-object row loop inside the worker).

    Scale: narrow stage, no shuffle; batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch. The oracle computes
    the same features in SQL.
    """
    import pyarrow as pa

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def features(batches):
        import pyarrow.compute as pc
        for batch in batches:
            t = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"),
                 pc.cast(pc.binary_length(t), pa.int64()),
                 pc.cast(pc.utf8_length(t), pa.int64()),
                 pc.cast(pc.count_substring(t, " "), pa.int64())],
                names=["doc_id", "n_bytes", "n_chars", "n_spaces"])

    return docs.mapInArrow(
        features,
        schema="doc_id bigint, n_bytes bigint, n_chars bigint, "
               "n_spaces bigint")


_ARROW_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
           AS n_spaces
FROM documents
"""


QUERIES = {
    "doc_chunking_udtf": (_doc_chunking_udtf, _CHUNKING_SQL),
    "grouped_rank_pandas": (_grouped_rank, _GROUPED_RANK_SQL),
    "cogroup_reconcile_pandas": (_cogroup_reconcile, _COGROUP_SQL),
    "arrow_batch_features": (_arrow_batch_features, _ARROW_SQL),
}
