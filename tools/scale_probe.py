"""Scaling probe: measure how document-corpus queries behave as the
corpus grows 1x → Nx, with every replica a verbatim duplicate (the
worst case for dedup candidate generation — every doc gains N-1 exact
copies under distinct ids).

Replicated corpora are written as SINGLE parquet files (the driver
testdata layout `tables.load` expects) via DuckDB, so the probe runs
against exactly the loader the engine uses.

Usage:
  python tools/scale_probe.py [query ...]          # default query set
  SCALE_MULTS=1,4,10 python tools/scale_probe.py   # multiplier set

Prints one line per (multiplier, query): `{mult}x {query}: {sec}s`.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALE_BASE",
                      "/root/testdata/sf0.1/documents.parquet")
MULTS = [int(m) for m in
         os.environ.get("SCALE_MULTS", "1,4,10").split(",")]
DEFAULT_QUERIES = [
    "duplicate_span_removal", "ngram_lm_perplexity", "bm25_topk",
    "longest_dup_span", "bpe_encode_docs",
]


SCALE_TABLE = os.environ.get("SCALE_TABLE", "documents")


def replicated_corpus_dir(mult: int, n_docs: int) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix=f"scale{mult}x_")
    if SCALE_TABLE == "events":
        # replicate the event stream with disjoint event/user id
        # namespaces per copy: users multiply (a growing product),
        # the time span stays fixed (denser traffic, the hard case
        # for per-day aggregates and per-user reductions)
        sel = " UNION ALL ".join(
            f"SELECT event_id + {k * 10 * n_docs} AS event_id, ts,"
            f" user_id + {k * 100000} AS user_id, event_type, value,"
            f" props FROM '{BASE}'" for k in range(mult))
        duckdb.sql(f"COPY ({sel}) TO '{d}/events.parquet'"
                   " (FORMAT PARQUET)")
        return d
    sel = " UNION ALL ".join(
        f"SELECT doc_id + {k * 10 * n_docs} AS doc_id, text, lang, source,"
        f" n_chars FROM '{BASE}'" for k in range(mult))
    duckdb.sql(f"COPY ({sel}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return d


def main() -> None:
    import duckdb

    from alma_publish_to_marc_spark import registry
    from alma_publish_to_marc_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    qs = registry.queries()
    n = duckdb.sql(f"SELECT count(*) FROM '{BASE}'").fetchone()[0]
    for mult in MULTS:
        d = replicated_corpus_dir(mult, n)
        for q in names:
            if q not in qs:
                continue
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[q](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.time() - t0)
            print(f"{mult}x {q}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
