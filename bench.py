"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink — forces every column
and operator to execute without paying collect/transfer cost, so the
number measures the engine, not the driver link.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headliners: the flagship plus the operators that dominate a real run
# (multi-way join, window dedup, group-collect, text dedup, ANN).
# The first 16 names are the frozen "core suite" (the r02 headliner
# set): their subtotal is emitted as core_16_sec every round so
# cross-round comparisons stay apples-to-apples as headliners grow.
# NEVER reorder or remove members; append new headliners after them.
CORE_16 = 16

HEADLINE = [
    "item_info_flagship",
    "multiway_join_revenue",
    "asof_latest_event",
    "last_writer_wins",
    "collect_list_per_group",
    "exact_dedup",
    "minhash_lsh_neardup",
    "ann_cosine_topk",
    "doc_quality_score",
    "window_frame_suite",
    "range_interval_join",
    "tfidf_top_terms",
    "doc_chunking",
    "duplicate_ngram_spans",
    "training_order_shuffle",
    "corpus_curation_end2end",
    "bucketed_item_info_join",
    "bm25_topk",
    "ngram_lm_perplexity",
    "duplicate_span_removal",
    "knn_graph_topk",
    "hll_distinct_estimate",
    "dq_constraint_audit",
    # TPC-H analog shapes (round 4): scan-agg, star join, folded
    # EXISTS/NOT-EXISTS, and the CF recommender's bounded self-join.
    "pricing_summary_report",
    "local_supplier_volume",
    "waiting_orders_supplier",
    "item_item_recs",
    # round 5: incremental IVF index maintenance (census + drift),
    # cross-doc boilerplate stripping, scalar-quantized ANN
    "ann_index_incremental",
    "boilerplate_segment_removal",
    "ann_sq_topk",
    # round 5c: preference QA (driver-paced Bradley-Terry), greedy
    # max-coverage selection (K anti-join rounds — the one new op
    # whose working set grows with the corpus), integer Wasserstein
    "bradley_terry_strength",
    "greedy_coverage_selection",
    "wasserstein_source_shift",
    # round 6: retrieval-quality eval (panel-broadcast ranking) and the
    # exact-integer HMM decode (one-shuffle scan-fused fold)
    "retrieval_ranking_metrics",
    "viterbi_state_decode",
    # round 7: blocked Gram matrix (one-shuffle cell aggregation — the
    # linalg primitive) and the FFD compaction fold (grouped
    # list-accumulator fold, the storage-planning shape)
    "gram_matrix_blocked",
    "compaction_bin_packing",
    # round 8: the engine's namesake path — nested publish-record
    # synthesis + the REAL split_publish (control-group walk, 852/ITM
    # relocation, item typing). bibs tracks the control-field/relocate
    # codec; items tracks the deepest explode (record→holdings→items)
    "publish_split_bibs",
    "publish_split_items",
    # round 8: the grid-blocked spatial radius self-join — the densest
    # new join shape (9-cell probe, corpus x corpus equi join)
    "grid_neighbor_join",
]


def main() -> None:
    from alma_publish_to_marc_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once so timings measure steady state
    spark.range(1).count()

    head = (HEADLINE[:CORE_16]
            if os.environ.get("SPARK_GRAFT_BENCH_CORE_ONLY") else HEADLINE)
    names = [n for n in head if n in qs]
    from alma_publish_to_marc_spark import registry

    for name in names:
        # drop blocks persisted by the previous query (minhash sigs etc.)
        # and deferred staged-parquet dirs (ktruss_prune)
        spark.catalog.clearCache()
        registry.release_caches()
        # two runs, report the min: first run pays JIT/codegen warmup and
        # page-cache misses; steady state is what a resident cluster sees
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    # streaming end-to-end latency is reported in its own field (not in
    # queries/value) so the headline total stays comparable round-over-
    # round; per-batch wall time is the incremental-run latency metric.
    streaming = ({} if os.environ.get("SPARK_GRAFT_BENCH_CORE_ONLY")
                 else _bench_streaming_curation(spark))

    core = [n for n in HEADLINE[:CORE_16] if n in timings]
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "core_16_sec": round(sum(timings[n] for n in core), 3),
        "streaming": streaming,
        "sf": sf,
        "regressions": _regressions(timings, sf),
    }))


def _bench_streaming_curation(spark) -> dict[str, float]:
    """Incremental-path headliner: two availableNow drains of a
    half/half documents split through ingest → funnel (lang/quality/
    batch-vs-corpus near-dup) → band+gram index append → shard write
    (streaming/curation.py). Per-batch wall-clock is the end-to-end
    latency one scheduled incremental run pays; batch1 additionally
    probes batch0's persisted band/gram index, so its time is the
    steady-state per-drop cost."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from alma_publish_to_marc_spark.streaming.curation import (
        run_incremental_curation)
    from alma_publish_to_marc_spark.tables import load

    root = tempfile.mkdtemp(prefix="bench_stream_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    out: dict[str, float] = {}
    try:
        for i in (0, 1):
            (docs.where(F.col("doc_id") % 2 == i).coalesce(8)
             .write.mode("append").parquet(landing))
            spark.catalog.clearCache()
            t0 = time.time()
            run_incremental_curation(spark, landing, state, ckpt)
            out[f"streaming_curation_batch{i}"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# Regression guard: compare against the previous round's recorded bench.
# Run-to-run noise on this box is 20-30% — and ABSOLUTE noise on
# sub-second queries is a large multiple of that (measured: exact_dedup
# best-of-N ranges 0.32-0.65s across machine states with an identical
# plan), so a ratio alone flags phantoms. Flag only when both the ratio
# AND the absolute delta are beyond the noise floor.
_REGRESSION_FACTOR = 1.5
_REGRESSION_MIN_DELTA_SEC = 0.5


def _prev_timings(sf) -> dict[str, float]:
    here = os.path.dirname(os.path.abspath(__file__))
    best: dict[str, float] | None = None
    best_n = -1
    for fn in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        try:
            with open(os.path.join(here, fn)) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") or rec
        if parsed.get("sf") != sf or "queries" not in parsed:
            continue
        if int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), parsed["queries"]
    return best or {}


def _regressions(timings: dict[str, float], sf) -> dict[str, dict[str, float]]:
    prev = _prev_timings(sf)
    out = {}
    for name, sec in timings.items():
        base = prev.get(name)
        if (base and base > 0 and sec > base * _REGRESSION_FACTOR
                and sec - base > _REGRESSION_MIN_DELTA_SEC):
            out[name] = {"prev_sec": base, "now_sec": sec,
                         "factor": round(sec / base, 2)}
    return out


if __name__ == "__main__":
    main()
