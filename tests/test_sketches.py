"""Sketch-math properties beyond the oracle gate (which already proves
cross-engine determinism at sf0.001): the estimates must actually be
GOOD sketches, not just reproducible ones."""

import pytest

from alma_publish_to_marc_spark.operators import sketches as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    kmv = S.kmv_distinct(spark, SF).collect()[0]
    hll = S.hll_distinct(spark, SF).collect()[0]
    cms = S.cms_heavy_hitters(spark, SF).collect()
    return kmv, hll, cms


def test_kmv_estimate_within_theory_bound(rows):
    kmv, _, _ = rows
    # KMV relative std error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma.
    # Below k distinct values the sketch holds the whole set → exact.
    assert kmv.k == S.KMV_K
    if kmv.exact_distinct < S.KMV_K:
        assert kmv.est_distinct == kmv.exact_distinct
        assert kmv.err_pct == 0.0
    else:
        assert abs(kmv.err_pct) < 25.0
    assert kmv.h_k > 0


def test_hll_estimate_within_theory_bound(rows):
    _, hll, _ = rows
    # HLL std error ~ 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert hll.m == 256
    assert 0 < hll.used_buckets <= 256
    assert abs(hll.err_pct) < 26.0


def test_cms_never_underestimates(rows):
    _, _, cms = rows
    assert len(cms) == S.TOPN
    for r in cms:
        assert r.overestimate >= 0, f"CMS underestimated {r.gram}"
        assert r.est_count >= r.exact_count


def test_cms_top_terms_ranked(rows):
    _, _, cms = rows
    counts = [r.exact_count for r in cms]
    assert counts == sorted(counts, reverse=True)


def test_bloom_fpr_matches_theory(spark):
    row = S.bloom_filter_fpr(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.n_probes == S.BF_PROBES
    assert 0 <= row.n_false_pos <= row.n_probes
    # measured FPR within 3 sigma of theory (binomial std err)
    import math
    p = row.fpr_theory
    se = math.sqrt(max(p * (1 - p), 1e-12) / row.n_probes)
    assert abs(row.fpr_measured - p) < 3 * se + 1e-6


def test_bloom_no_false_negatives(spark):
    # the query probes every member through the built filter in-plan
    row = S.bloom_filter_fpr(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_members > 0
    assert row.n_false_neg == 0


def test_histogram_quantiles_within_half_bin(spark):
    rows = S.histogram_quantile_sketch(spark, "/root/testdata/sf0.001") \
        .collect()
    assert {r.quantile for r in rows} == {q for q, _ in S.HQ_QUANTILES}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stats = ev.selectExpr("min(value) mn", "max(value) mx").collect()[0]
    half_bin = (stats.mx - stats.mn) / S.HQ_BINS / 2
    for r in rows:
        assert abs(r.err) <= half_bin + 1e-6, r
