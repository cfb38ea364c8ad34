"""Structural physical-plan contracts: the scale properties VERDICT
and README claim are pinned here, so a regression (a lost broadcast, a
crept-in global sort, a scan that stopped pruning) fails pytest before
it costs anything on a cluster."""

from __future__ import annotations

import pytest

from tools.explain_audit import summarize

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def props(spark):
    import __spark_entry__ as e

    qs = e.queries()

    def get(name):
        return summarize(spark, qs[name](spark, SF_SMOKE))

    return get


def test_flagship_is_broadcast_only_single_shuffle(props):
    p = props("item_info_flagship")
    assert p["shuffles"] <= 1
    assert p["sort_merge_joins"] == 0
    assert p["broadcast_joins"] >= 4
    # every scan prunes columns (no full-width reads)
    assert all(w <= 4 for w in p["scan_widths"])


def test_tfidf_never_broadcasts_the_vocabulary(props):
    # the r01 scale-killer pin: the term join must stay sort-merge
    p = props("tfidf_top_terms")
    assert p["broadcast_joins"] == 0
    assert p["sort_merge_joins"] >= 1


def test_scan_fused_queries_have_zero_shuffles(props):
    for name in ("quality_classifier_score", "bpe_encode_docs",
                 "blob_printable", "pii_redaction"):
        p = props(name)
        assert p["shuffles"] == 0, name
        assert p["range_shuffles"] == 0, name


def test_no_global_sorts_in_order_sensitive_paths(props):
    # training order and sampling must never range-partition
    for name in ("training_order_shuffle", "uniform_sample_exact",
                 "curriculum_order", "duplicate_ngram_spans",
                 "exact_dedup"):
        assert props(name)["range_shuffles"] == 0, name


def test_ann_paths_broadcast_the_small_side(props):
    # brute force: non-equi condition -> broadcast NESTED-LOOP of the
    # tiny query panel; LSH: bucket equi-join -> broadcast HASH join
    p = props("ann_cosine_topk")
    assert p["broadcast_nl_joins"] >= 1
    assert p["sort_merge_joins"] == 0
    p = props("ann_lsh_topk")
    assert p["broadcast_joins"] >= 1
    assert p["sort_merge_joins"] == 0


def test_pq_probe_is_broadcast_only(props):
    p = props("pq_adc_topk")
    assert p["broadcast_joins"] >= 4  # one per subspace lookup
    assert p["sort_merge_joins"] == 0
