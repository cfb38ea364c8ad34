"""Mathematical invariants of the round-5b operators (ranking metrics,
HITS, clustering profile, assortativity, hard negatives, join-size
estimation audit). The oracle proves cross-engine agreement; these
prove the algorithms satisfy the laws that make their outputs
meaningful."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def q(spark):
    import __spark_entry__ as e

    qs = e.queries()
    return lambda name: qs[name](spark, SF_SMOKE)


def _panel_size(spark):
    from alma_publish_to_marc_spark.operators.learning import (
        KNN_PROBE_MOD, KNN_PROBE_REM)
    from alma_publish_to_marc_spark.tables import load

    emb = load(spark, SF_SMOKE, "embeddings")
    return (emb.where(F.col("vec_id") % KNN_PROBE_MOD == KNN_PROBE_REM)
            .count())


def test_ranking_metrics_match_numpy_bruteforce(spark, q):
    # Recompute MRR/MAP/NDCG per label with numpy + the same literal
    # discount table; the aggregated integer means must agree exactly.
    import numpy as np

    from alma_publish_to_marc_spark.operators.learning import (
        _AP_LCM, _DISC_E9, _IDCG_E9, KNN_PROBE_MOD, KNN_PROBE_REM, RANK_K)
    from alma_publish_to_marc_spark.tables import load

    rows = load(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labs = np.array([r["label"] for r in rows])
    # replicate Spark round() (half-away) quantization
    raw = np.array([r["embedding"] for r in rows], dtype=np.float64)
    v = np.sign(raw) * np.floor(np.abs(raw) * 1000 + 0.5)
    agg = {}
    for i in range(len(ids)):
        if ids[i] % KNN_PROBE_MOD != KNN_PROBE_REM:
            continue
        d = ((v - v[i]) ** 2).sum(axis=1)
        order = sorted((int(d[j]), int(ids[j]), int(labs[j]))
                       for j in range(len(ids)) if j != i)[:RANK_K]
        rel = [1 if l == labs[i] else 0 for _, _, l in order]
        n_rel = int((labs == labs[i]).sum()) - 1
        r10 = min(n_rel, RANK_K)
        first = next((k + 1 for k, r in enumerate(rel) if r), None)
        mrr = 1000000 // first if first else 0
        cum, ap_num, dcg = 0, 0, 0
        for k, r in enumerate(rel):
            cum += r
            ap_num += r * cum * (_AP_LCM // (k + 1))
            dcg += r * _DISC_E9[k]
        ap = (1000000 * ap_num) // (_AP_LCM * r10)
        ndcg = (1000000 * dcg) // _IDCG_E9[r10 - 1]
        agg.setdefault(int(labs[i]), []).append((mrr, ap, ndcg))
    got = {r["qlabel"]: r for r in q("ranking_metrics_eval").collect()}
    assert set(got) == set(agg)
    for lab, triples in agg.items():
        n = len(triples)
        assert got[lab]["n_probes"] == n
        assert got[lab]["mean_mrr_e6"] == sum(t[0] for t in triples) // n
        assert got[lab]["mean_ap_e6"] == sum(t[1] for t in triples) // n
        assert got[lab]["mean_ndcg_e6"] == sum(t[2] for t in triples) // n


def test_hits_normalization_and_shape(q):
    from alma_publish_to_marc_spark.operators.graph_queries import (
        HITS_SCALE, HITS_TOPK)

    rows = q("hits_hubs_authorities").collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
    assert set(by_role) == {"hub", "authority"}
    for role, rs in by_role.items():
        assert len(rs) <= HITS_TOPK
        scores = [r["score_e6"] for r in rs]
        # normalization law: the best node of each role scores exactly
        # SCALE ((raw*SCALE) div max(raw) == SCALE at the argmax)
        assert max(scores) == HITS_SCALE
        assert all(0 < s <= HITS_SCALE for s in scores)
        assert all(r["degree"] >= 1 for r in rs)


def test_clustering_profile_bucket_bounds(q):
    rows = q("local_clustering_profile").collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] <= 10
        lo, hi = r["bucket"] * 100000, (r["bucket"] + 1) * 100000
        assert lo <= r["mean_coeff_e6"] < hi or r["mean_coeff_e6"] == 1000000
        assert r["n_nodes"] >= 1
        assert r["mean_deg_e3"] >= 2000  # profile excludes deg < 2


def test_assortativity_is_a_correlation(q):
    r = q("degree_assortativity").collect()[0]
    assert -1.0 <= r["assortativity_r"] <= 1.0
    # Cauchy-Schwarz: the variance denominator is non-negative
    assert r["m_ends"] * r["sum_x2"] - r["sum_x"] * r["sum_x"] >= 0
    assert r["m_ends"] % 2 == 0  # both orientations of every edge


def test_hard_negative_margins_coherent(spark, q):
    rows = q("hard_negative_mining").collect()
    assert sum(r["n_probes"] for r in rows) == _panel_size(spark)
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_probes"]
        # min ≤ mean: min·n ≤ sum
        assert r["min_margin_q"] * r["n_probes"] <= r["sum_margin_q"]
        if r["min_margin_q"] >= 0:
            assert r["n_violations"] == 0


def test_join_estimation_exact_on_pk_fk_edges(q):
    # Every audited edge is PK←FK with full coverage, so the uniform
    # estimate is EXACT (ndv_left == n_left ≥ ndv_right) and the
    # actual size is the FK side's row count; q-error collapses to 1.
    rows = q("join_size_estimation_audit").collect()
    assert len(rows) == 4
    for r in rows:
        assert r["ndv_left"] == r["n_left"]
        assert r["ndv_right"] <= r["ndv_left"]
        assert r["actual_rows"] == r["n_right"]
        assert r["est_rows"] == r["actual_rows"]
        assert r["q_error_e3"] == 1000


def test_incremental_cc_labels_equal_full_rebuild(spark):
    # Per-node law (stronger than the query's summary row): star-
    # compressed incremental components assign every node the SAME
    # label as a from-scratch run over the full edge set.
    from alma_publish_to_marc_spark.operators import graph_queries as G
    from alma_publish_to_marc_spark.operators.similarity_queries import (
        INC_MOD, INC_REM)

    full_e = G._candidate_edges(spark, SF_SMOKE)
    is_new = lambda c: c % INC_MOD == INC_REM
    base_e = full_e.where(~is_new(F.col("src")) & ~is_new(F.col("dst")))
    delta_e = full_e.where(is_new(F.col("src")) | is_new(F.col("dst")))
    base_lbl = G.connected_components(base_e)
    star = base_lbl.select(F.col("node").alias("src"),
                           F.col("cluster_id").alias("dst"))
    inc = G.connected_components(
        delta_e.select("src", "dst").unionByName(star))
    full = G.connected_components(full_e)
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_conformal_coverage_meets_the_bound(q):
    # The conformal guarantee: empirical test coverage lands at or
    # above 1 - alpha (up to finite-sample slack one rank wide). Also
    # the rank is the ceil((1-a)(n+1)) formula and coverage is a
    # valid proportion.
    r = q("conformal_prediction_eval").collect()[0]
    assert r["k_rank"] == -(-9 * (r["n_cal"] + 1) // 10)
    assert 0 <= r["coverage_e6"] <= 1000000
    # exchangeable splits: allow slack of ~2/sqrt(n_test) below target
    slack = int(2_000_000 / (r["n_test"] ** 0.5))
    assert r["coverage_e6"] >= r["target_e6"] - slack


def test_rebalance_audit_matches_theory(q):
    # mod-N 16->17 moves ~16/17 of keys; rendezvous moves ~1/17 (the
    # new shard's win rate). Both are tight concentration bounds at
    # corpus size; conservative +/-0.1 windows still separate the two
    # schemes by an order of magnitude.
    r = q("consistent_hash_rebalance_audit").collect()[0]
    assert r["moved_mod"] + 0 <= r["n_docs"]
    frac_mod = r["moved_mod_e6"] / 1e6
    frac_hrw = r["moved_hrw_e6"] / 1e6
    assert abs(frac_mod - 16 / 17) < 0.1
    assert abs(frac_hrw - 1 / 17) < 0.1
    assert frac_hrw < frac_mod / 4
