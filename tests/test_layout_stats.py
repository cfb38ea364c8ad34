"""Structural invariants for the layout/statistics operators
(cross-engine value parity is covered by the oracle gate)."""

import pytest

from alma_publish_to_marc_spark.operators import upsert_queries as UQ
from alma_publish_to_marc_spark.plans import behavior_queries as BQ
from alma_publish_to_marc_spark.plans import warehouse_bench as WB

SF = "/root/testdata/sf0.001"


def test_zorder_tradeoff_holds(spark):
    rows = {(r.layout, r.probe_dim): r
            for r in WB.zorder_layout_stats(spark, SF).collect()}
    lin_px = rows[("linear_part", "px")]
    lin_py = rows[("linear_part", "py")]
    z_px = rows[("zorder", "px")]
    z_py = rows[("zorder", "py")]
    # linear is optimal on its own dimension...
    assert lin_px.files_scanned <= z_px.files_scanned
    # ...and degenerate on the other; z-order must beat it there
    assert lin_py.files_scanned == lin_py.n_files
    assert z_py.files_scanned < lin_py.files_scanned
    for r in rows.values():
        assert 0 <= r.files_scanned <= r.n_files
        assert r.rows_scanned <= r.rows_total


def test_incremental_state_merge_is_exact(spark):
    rows = UQ.incremental_agg_maintenance(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.state_matches == 1
        assert r.n_merged == r.n_full
        assert r.mean_merged == r.mean_full
        assert r.var_merged == r.var_full


def test_pareto_frontier_is_a_chain(spark):
    rows = sorted(BQ.pareto_frontier(spark, SF).collect(),
                  key=lambda r: r.epoch_us)
    assert rows
    # by construction the frontier is strictly increasing in value
    vals = [r.value for r in rows]
    assert all(a < b for a, b in zip(vals, vals[1:]))


def test_sampled_ci_sane(spark):
    rows = BQ.sampled_mean_ci(spark, "/root/testdata/sf0.01").collect()
    covered = sum(r.covered for r in rows)
    for r in rows:
        assert r.ci_lo <= r.est_mean <= r.ci_hi
        assert 0 < r.n_sample < r.n_total
    # 95% CIs: all 5 types covering is the expected outcome; allow 1 miss
    assert covered >= len(rows) - 1


def test_neyman_allocation_sums_to_budget(spark):
    from alma_publish_to_marc_spark.plans import corpus_queries as CQ
    alloc = CQ.neyman_allocation(spark, SF).collect()
    assert sum(r.n_labels for r in alloc) == CQ.NEYMAN_BUDGET
    assert all(r.n_labels >= 0 for r in alloc)
