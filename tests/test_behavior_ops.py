"""Unit tests for plans/behavior_queries.py (event analytics)."""

from __future__ import annotations

from datetime import datetime

import pytest

from alma_publish_to_marc_spark.plans import behavior_queries as B

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def _events_dir(spark, tmp_path, rows):
    # tables.load expects a single parquet FILE (driver layout)
    import pandas as pd

    d = tmp_path / "evdir"
    d.mkdir(exist_ok=True)
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                "event_type", "value", "props"]) \
        .to_parquet(str(d / "events.parquet"))
    return str(d)


def test_funnel_ordering_is_strict(spark, tmp_path):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    rows = [
        # user 1 converts fully in order
        (1, t(9), 1, "view", 0.0, "{}"),
        (2, t(10), 1, "click", 0.0, "{}"),
        (3, t(11), 1, "purchase", 1.0, "{}"),
        # user 2 clicks BEFORE viewing: click must not count
        (4, t(9), 2, "click", 0.0, "{}"),
        (5, t(10), 2, "view", 0.0, "{}"),
        # user 3 purchases with no click: must not count
        (6, t(9), 3, "view", 0.0, "{}"),
        (7, t(10), 3, "purchase", 1.0, "{}"),
    ]
    sf = _events_dir(spark, tmp_path, rows)
    r = B.conversion_funnel(spark, sf).collect()[0]
    assert r["n_users"] == 3
    assert r["n_viewed"] == 3
    assert r["n_clicked_after_view"] == 1
    assert r["n_purchased_after_click"] == 1
    assert r["view_to_click_rate"] == pytest.approx(1 / 3, abs=1e-4)


def test_cohort_retention_day_zero_is_full(spark, tmp_path):
    t = lambda d, h=9: datetime(2024, 1, d, h)
    rows = [
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "view", 0.0, "{}"),    # day1 cohort back on day 2
        (3, t(1), 2, "view", 0.0, "{}"),    # day1 cohort, never returns
        (4, t(2), 3, "view", 0.0, "{}"),    # day2 cohort
    ]
    sf = _events_dir(spark, tmp_path, rows)
    out = {(r["cohort_day"], r["day_offset"]): r
           for r in B.cohort_retention(spark, sf).collect()}
    assert out[("2024-01-01", 0)]["retention_rate"] == 1.0
    assert out[("2024-01-01", 0)]["cohort_size"] == 2
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention_rate"] == 0.5
    assert out[("2024-01-02", 0)]["cohort_size"] == 1


def test_ks_statistic_bounds_and_shift_detection(spark, tmp_path):
    t = lambda d, h=9: datetime(2024, 1, d, h)
    rows = []
    eid = 0
    # 'shift' type: early values ~ [0,10), late ~ [100,110) -> KS = 1
    # 'same' type: identical distribution both halves -> KS = 0
    for i in range(10):
        eid += 1; rows.append((eid, t(1), 1, "shift", float(i), "{}"))
        eid += 1; rows.append((eid, t(20), 1, "shift", 100.0 + i, "{}"))
        eid += 1; rows.append((eid, t(1), 1, "same", float(i), "{}"))
        eid += 1; rows.append((eid, t(20), 1, "same", float(i), "{}"))
    sf = _events_dir(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in B.ks_drift_test(spark, sf).collect()}
    assert out["shift"]["ks_stat"] == 1.0
    assert out["same"]["ks_stat"] == 0.0
    assert out["shift"]["n_early"] == out["shift"]["n_late"] == 10


def test_ab_ztest_null_on_hash_split(spark):
    r = B.ab_test_ztest(spark, "/root/testdata/sf0.01").collect()[0]
    # parity split of hash-random users: expect the null result
    assert abs(r["z_stat"]) < 1.96
    assert r["n0"] + r["n1"] == 150
    assert 0.0 < r["rate_a"] < 1.0 and 0.0 < r["rate_b"] < 1.0


def test_weighted_sample_prefers_heavy_docs(spark):
    import duckdb

    from alma_publish_to_marc_spark.plans import corpus_queries as C

    rows = C.weighted_sample_es(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == C.ES_K
    ranks = sorted(r["sample_rank"] for r in rows)
    assert ranks == list(range(1, C.ES_K + 1))
    mean_all = duckdb.sql(
        "select avg(n_chars) from "
        "'/root/testdata/sf0.01/documents.parquet'").fetchone()[0]
    mean_sample = sum(r["n_chars"] for r in rows) / len(rows)
    # inclusion probability ∝ n_chars: the sample skews heavy
    assert mean_sample > mean_all
    # deterministic
    again = C.weighted_sample_es(spark, "/root/testdata/sf0.01").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_transition_matrix_rows_normalize(spark):
    rows = B.event_transition_matrix(spark, "/root/testdata/sf0.01").collect()
    assert rows
    per_from: dict[str, float] = {}
    for r in rows:
        per_from[r["from_type"]] = per_from.get(r["from_type"], 0.0) \
            + r["p_transition"]
    for t, total in per_from.items():
        assert total == pytest.approx(1.0, abs=1e-2), t
