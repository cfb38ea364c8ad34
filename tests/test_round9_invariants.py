"""Semantic invariants for the round-9 query families (posttrain /
weighting) — the oracle gate proves cross-engine equality; these prove
the answers make sense."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_grpo_advantages_are_standardized(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _grpo_group_advantage,
    )

    rows = _grpo_group_advantage(spark, SF).collect()
    assert rows
    n = sum(r["n_responses"] for r in rows)
    total = sum(r["sum_a_e6"] for r in rows)
    # standardized advantages sum to ~0 per group (floor loses < 1e-6
    # per response, always downward)
    assert -n <= total <= 0
    # z-scores live in a few-sigma range
    assert all(abs(r["a_bucket"]) <= 40 for r in rows)


def test_gae_fold_matches_reference_recursion(spark):
    import pandas as pd

    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _gae_advantage_fold,
    )

    rows = _gae_advantage_fold(spark, SF).collect()
    got_users = sum(r["n_users"] for r in rows)
    got_sum = sum(r["sum_a0"] for r in rows)

    pdf = pd.read_parquet(SF + "/events.parquet",
                          columns=["user_id", "event_id", "ts", "value"])
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    pdf["r"] = (pdf["value"] * 100).round().astype("int64")
    total = 0
    for _, g in pdf.sort_values(["us", "event_id"]).groupby("user_id"):
        r = list(g["r"])
        v = [0] + r[:-1]                      # lag baseline
        vnext = v[1:] + [0]
        # Spark div / DuckDB // truncate toward zero; Python // floors.
        # Emulate truncation explicitly so a negative 9*vn (possible if
        # event values go negative) can't diverge from the engines.
        d = [ri + (9 * vn // 10 if vn >= 0 else -(-(9 * vn) // 10)) - vi
             for ri, vn, vi in zip(r, vnext, v)]
        a = 0
        for dt in reversed(d):
            # Spark div truncates toward zero (matches int() for the
            # positive products here; 855*a can be negative — emulate
            # truncation explicitly)
            q = (855 * a)
            a = dt + (q // 1000 if q >= 0 else -((-q) // 1000))
        total += a
    assert got_users == pdf["user_id"].nunique()
    assert got_sum == total


def test_prefix_cache_accounting_is_consistent(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _prompt_prefix_cache_stats,
    )
    from alma_publish_to_marc_spark.tables import load

    rows = _prompt_prefix_cache_stats(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert sum(r["group_size"] * r["n_groups"] for r in rows) == n_docs
    for r in rows:
        # cacheable = (n-1)/n of the group's prefix tokens
        assert r["cacheable_tokens"] * r["group_size"] == \
            r["prefix_tokens"] * (r["group_size"] - 1)


def test_int8_error_is_bounded_by_half_step(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _int8_quantization_error,
    )

    rows = _int8_quantization_error(spark, SF).collect()
    assert rows
    for r in rows:
        # |x - x'| <= maxabs/254 (half a quantization step); embeddings
        # are unit-ish so maxabs <= ~1 -> err well under 0.01
        assert 0 <= r["avg_maxerr_e9"] < 10_000_000
        assert 0 <= r["avg_mse_e12"] < r["avg_maxerr_e9"] * 1000


def test_heaps_slope_is_a_sublinear_power_law(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _heaps_law_log2_fit,
    )

    r = _heaps_law_log2_fit(spark, SF).collect()[0]
    # type growth is positive but sublinear in tokens
    assert 0 < r["slope_e6"] <= 1_000_000
    assert r["mean_ly_e6"] <= r["mean_lx_e6"]


def test_ipf_weights_hit_both_margins(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _raking_ipf_weights,
    )

    rows = _raking_ipf_weights(spark, SF).collect()
    total = sum(r["cnt"] for r in rows)
    # weighted counts per margin should approach the uniform targets
    for key, card in (("seg", 5), ("nat", 25)):
        target = total // card
        sums: dict = {}
        for r in rows:
            sums[r[key]] = sums.get(r[key], 0) + r["cnt"] * r["w_e6"] / 1e6
        for v in sums.values():
            assert abs(v - target) / target < 0.05  # 2 sweeps converge


def test_kalman_state_tracks_observation_range(spark):
    from pyspark.sql import functions as F

    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _kalman_filter_1d,
    )
    from alma_publish_to_marc_spark.tables import load

    r = _kalman_filter_1d(spark, SF).collect()[0]
    ev = (load(spark, SF, "events")
          .agg(F.expr("min(cast(round(value*100,0) as bigint))"),
               F.expr("max(cast(round(value*100,0) as bigint))")
               ).collect()[0])
    assert ev[0] * 1000 <= r["x_e3"] <= ev[1] * 1000
    # posterior covariance below prior R and positive
    assert 0 < r["p_e3"] < 1_000_000
    assert r["n_days"] > 0 and r["sum_abs_innov_e3"] >= 0


def test_jackknife_variance_is_nonnegative_and_centered(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _jackknife_nation_means,
    )

    r = _jackknife_nation_means(spark, SF).collect()[0]
    assert r["n_nations"] == 25
    assert r["jk_var_e6"] >= 0
    # leave-one-group-out mean stays near the full mean (e3 units)
    assert abs(r["theta_jk_e3"] - r["theta_e3"]) < 50_000


def test_epsilon_greedy_replay_is_consistent(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _EG_T, _epsilon_greedy_replay,
    )

    r = _epsilon_greedy_replay(spark, SF).collect()[0]
    assert 0 < r["n_steps"] <= _EG_T
    # ~1/5 of steps match a 5-arm policy against a logged stream
    assert 0 < r["matched"] <= r["n_steps"]
    assert 0 <= r["cum_reward"] <= r["matched"]
    assert 1 <= r["best_arm"] <= 5
    assert 0 <= r["best_mean_e6"] <= 1_000_000


def test_context_window_waste_is_monotone(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _context_window_waste,
    )

    rows = sorted(_context_window_waste(spark, SF).collect(),
                  key=lambda r: r["w"])
    for a, b in zip(rows, rows[1:]):
        # larger windows truncate fewer docs, waste fewer tokens,
        # and run emptier
        assert a["docs_truncated"] >= b["docs_truncated"]
        assert a["tokens_kept"] <= b["tokens_kept"]
        assert a["fill_e6"] >= b["fill_e6"]
        assert a["tokens_total"] == b["tokens_total"]


def test_rich_club_is_denser_than_graph_average(spark):
    from alma_publish_to_marc_spark.plans.spatial_queries import (
        rich_club_coefficient,
    )

    rows = sorted(rich_club_coefficient(spark, SF).collect(),
                  key=lambda r: r["k"])
    assert rows
    for r in rows:
        assert 0 <= r["phi_e6"] <= 1_000_000
        if r["n_nodes"] >= 2:
            assert r["n_edges"] <= r["n_nodes"] * (r["n_nodes"] - 1) // 2
    # club membership shrinks as the threshold rises
    for a, b in zip(rows, rows[1:]):
        assert a["n_nodes"] >= b["n_nodes"]


def test_smd_detects_spend_imbalance(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _covariate_balance_smd,
    )

    rows = {r["covariate"]: r
            for r in _covariate_balance_smd(spark, SF).collect()}
    assert set(rows) == {"bal", "spend"}
    for r in rows.values():
        assert r["n1"] > 0 and r["n0"] > 0
    # treatment is DEFINED by order count, so spend must be imbalanced
    # (treated spend strictly higher), while balance is independent
    assert rows["spend"]["smd_e6"] > 500_000
    assert abs(rows["bal"]["smd_e6"]) < abs(rows["spend"]["smd_e6"])


def test_skew_kurtosis_of_uniformish_values(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _skewness_kurtosis_profile,
    )

    rows = _skewness_kurtosis_profile(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # driver values are bounded -> no extreme shape stats
        assert abs(r["skew_e6"]) < 5_000_000
        assert -3_000_000 <= r["ex_kurtosis_e6"] < 20_000_000


def test_ltv_projection_dominates_observed(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _ltv_cohort_projection,
    )

    rows = _ltv_cohort_projection(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_users"] > 0
        assert 0 <= r["decay_e6"] <= 950_000
        assert r["ltv_proj_rpu_c"] >= r["observed_rpu_c"]


def test_median_polish_centers_rows_and_columns(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _median_polish_residuals,
    )

    rows = _median_polish_residuals(spark, SF).collect()
    assert rows
    # after the final column sweep, every column's lower median is 0
    by_nat: dict = {}
    for r in rows:
        by_nat.setdefault(r["nat"], []).append(r["residual_u"])
    for vals in by_nat.values():
        vals.sort()
        assert vals[(len(vals) + 1) // 2 - 1] == 0


def test_modality_mix_shares_sum_to_one(spark):
    from alma_publish_to_marc_spark.multimodal.multimodal_queries import (
        _modality_mix_budget,
    )

    rows = _modality_mix_budget(spark, SF).collect()
    assert {r["media_format"] for r in rows} == {"jpeg", "png", "wav"}
    tot = sum(r["share_e6"] for r in rows)
    assert 999_997 <= tot <= 1_000_000  # floor slack < 1 per format
    for r in rows:
        assert r["token_equiv"] <= r["bytes_total"]
        assert r["vs_uniform_e6"] == r["share_e6"] - 1_000_000 // 3


def test_theta_forecast_blends_trend_and_level(spark):
    from alma_publish_to_marc_spark.plans.timeseries_queries import (
        _TH_H, _theta_method_forecast,
    )

    rows = sorted(_theta_method_forecast(spark, SF).collect(),
                  key=lambda r: r["h"])
    assert [r["h"] for r in rows] == list(range(1, _TH_H + 1))
    for r in rows:
        lo = min(r["trend_e3"], r["ses_e3"])
        hi = max(r["trend_e3"], r["ses_e3"])
        assert lo - 1 <= r["forecast_e3"] <= hi + 1
    # ses level is constant across horizons; trend moves monotonically
    assert len({r["ses_e3"] for r in rows}) == 1
    diffs = [b["trend_e3"] - a["trend_e3"] for a, b in zip(rows, rows[1:])]
    assert all(d * diffs[0] >= 0 for d in diffs)


def test_moe_balance_shares_and_loss(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _MOE_EXPERTS, _moe_router_balance,
    )

    rows = _moe_router_balance(spark, SF).collect()
    assert len(rows) == _MOE_EXPERTS
    f_tot = sum(r["f_e6"] for r in rows)
    assert 1_000_000 - _MOE_EXPERTS <= f_tot <= 1_000_000
    loss = rows[0]["aux_loss_e6"]
    assert all(r["aux_loss_e6"] == loss for r in rows)
    # L_aux is minimized at 1.0 under perfect balance; hash routing is
    # near-uniform so it should sit just above 1e6
    assert 990_000 <= loss <= 1_300_000
    assert rows[0]["capacity_factor_e6"] >= 1_000_000


def test_checkpoint_interval_is_dalyish(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _CKPT_COST_S, _checkpoint_interval_daly,
    )

    r = _checkpoint_interval_daly(spark, SF).collect()[0]
    assert r["n_failures"] > 1 and r["mtbf_s"] > 0
    t = (2 * _CKPT_COST_S * r["mtbf_s"]) ** 0.5
    assert abs(r["t_opt_s"] - int(t)) <= 1
    assert 0 < r["overhead_e6"] < 2_000_000


def test_mean_excess_curve_shrinks_toward_max(spark):
    from alma_publish_to_marc_spark.plans.weighting_queries import (
        _mean_excess_curve,
    )

    rows = sorted(_mean_excess_curve(spark, SF).collect(),
                  key=lambda r: r["k16"])
    assert [r["k16"] for r in rows] == [8, 10, 12, 14]
    for a, b in zip(rows, rows[1:]):
        # higher thresholds -> fewer exceedances
        assert a["n_exceed"] >= b["n_exceed"]
        assert a["u"] < b["u"]
    for r in rows:
        # excess can never exceed the remaining headroom to the max
        assert 0 <= r["mean_excess_c"] <= rows[-1]["u"] * 2


def test_percolation_sweep_is_monotone_in_radius(spark):
    from alma_publish_to_marc_spark.plans.spatial_queries import (
        percolation_radius_sweep,
    )
    from alma_publish_to_marc_spark.tables import load

    rows = sorted(percolation_radius_sweep(spark, SF).collect(),
                  key=lambda r: r["radius"])
    assert [r["radius"] for r in rows] == [4, 8, 12, 16]
    n = load(spark, SF, "events").count()
    for a, b in zip(rows, rows[1:]):
        # growing radius can only add edges and connect isolated nodes
        assert a["n_edges"] <= b["n_edges"]
        assert a["isolated_share_e6"] >= b["isolated_share_e6"]
        assert a["mean_degree_e6"] <= b["mean_degree_e6"]
    for r in rows:
        assert 0 <= r["isolated_share_e6"] <= 1_000_000
        assert r["n_edges"] <= n * (n - 1) // 2


def test_cascade_cost_tradeoff_is_monotone(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _CASCADE_BIG_COST, _CASCADE_SMALL_COST, _model_cascade_cost,
    )

    rows = sorted(_model_cascade_cost(spark, SF).collect(),
                  key=lambda r: r["threshold_e6"])
    lo = _CASCADE_SMALL_COST * 1000
    hi = _CASCADE_BIG_COST * 1000
    for r in rows:
        assert 0 <= r["n_small"] <= r["n_docs"]
        assert lo <= r["cost_per_1k_docs"] <= hi
    for a, b in zip(rows, rows[1:]):
        # raising the confidence bar routes MORE docs to the small
        # model (ttr < t) and therefore costs less
        assert a["n_small"] <= b["n_small"]
        assert a["cost_per_1k_docs"] >= b["cost_per_1k_docs"]
