"""Round-11 semantic invariants.

The oracle gate proves Spark == DuckDB at the shipped constants; these
pin claims the gate can't see:

- CAP-invariance of the depth-adaptive suffix family: escalation is a
  skew-bounding device, PROVABLY result-neutral (hot-block grants are
  exact). Forcing the Spark side to production CAP (1e5 — nothing
  escalates) against the UNCHANGED CAP=64-baked oracles must stay
  value-identical. A regression here means a level is leaking or a
  grant is wrong in a way the fixed-CAP parity gate cannot notice.
- suffix_span_removal internal consistency at real testdata scale
  (the hypothesis property test proves definition-equality on tiny
  adversarial corpora; this checks bookkeeping on the planted-dup
  corpus).
- bpe_domain_compression cross-checks against corpus-wide totals.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _duck(sql: str, sf_dir: str = SF):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def test_suffix_family_cap_invariant(spark):
    import pandas as pd

    from alma_publish_to_marc_spark.plans import corpus_queries as cq

    keys = ("suffix_lcp_repeats", "suffix_span_removal")
    old = cq._SFX_CAP
    try:
        frames = {}
        for cap in (64, 100000):
            cq._SFX_CAP = cap
            for k in keys:
                fn, _sql = cq.QUERIES[k]
                pdf = (fn(spark, SF).toPandas()
                       .sort_values("doc_id").reset_index(drop=True))
                frames[(k, cap)] = pdf
            from alma_publish_to_marc_spark import registry
            registry.release_caches()
            spark.catalog.clearCache()
        for k in keys:
            pd.testing.assert_frame_equal(frames[(k, 64)],
                                          frames[(k, 100000)])
    finally:
        cq._SFX_CAP = old


def test_suffix_span_removal_bookkeeping(spark):
    from alma_publish_to_marc_spark.plans import corpus_queries as cq

    rows = cq.suffix_span_removal(spark, SF).collect()
    assert len(rows) == 500  # one row per document, spine preserved
    n_docs_touched = 0
    for r in rows:
        kept = r["clean_text"].split(" ") if r["clean_text"] else []
        # '' splits to [''] when nothing was removed from a 1-word doc
        n_kept = len([w for w in kept if w != ""])
        assert r["n_words"] - r["n_removed"] == n_kept, r
        assert 0 <= r["n_spans_removed"] <= r["n_removed"]
        # a removed span has >= _SFX_RM_T words, so runs are bounded
        if r["n_removed"]:
            assert r["n_spans_removed"] >= 1
            assert r["n_removed"] >= cq._SFX_RM_T * 0 + r["n_spans_removed"]
            # each merged run covers >= _SFX_RM_T words
            assert r["n_removed"] >= cq._SFX_RM_T * r["n_spans_removed"]
            n_docs_touched += 1
    # the planted-dup corpus must actually exercise the removal path
    assert n_docs_touched > 0
    # consistency with the ranker: docs whose longest repeat is below
    # the removal threshold must be untouched
    best = {r["doc_id"]: r["longest_rep_words"]
            for r in cq.suffix_lcp_repeats(spark, SF).collect()}
    for r in rows:
        if best[r["doc_id"]] < cq._SFX_RM_T:
            assert r["n_removed"] == 0, r


def test_bpe_domain_compression_totals(spark):
    from alma_publish_to_marc_spark.plans import lm_queries as lm

    rows = lm.bpe_domain_compression(spark, SF).collect()
    assert rows and all(r["n_docs"] > 0 for r in rows)
    # domain totals must add up to the corpus-wide figures
    tot_docs = sum(r["n_docs"] for r in rows)
    assert tot_docs == 500
    duck = _duck("SELECT count(*) AS n, sum(len(regexp_split_to_array("
                 "trim(text), '\\s+'))) AS w FROM documents")
    assert int(duck["w"][0]) == sum(r["total_words"] for r in rows)
    for r in rows:
        # BPE merges only ever shrink the symbol count: tokens per
        # pretoken start at len(chars) and end >= 1 => chars/token >= 1
        assert r["chars_per_token_e4"] >= 10000
        assert r["total_tokens"] > 0
