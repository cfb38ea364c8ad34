"""Mathematical invariants of the round-4 operators.

The DuckDB oracle proves cross-engine agreement; these tests prove the
ALGORITHMS satisfy the laws that make their outputs meaningful — a
conservation law a refactor silently breaks would still pass parity
(both engines computing the same wrong thing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def q(spark):
    import __spark_entry__ as e

    qs = e.queries()
    return lambda name: qs[name](spark, SF_SMOKE)


def test_attribution_credits_conserve_10000_bps_per_purchase(spark, q):
    # total credited bps == 10000 × (purchases with ≥1 click in window)
    from alma_publish_to_marc_spark.plans.behavior_queries import \
        _PBA_LOOKBACK_US
    from alma_publish_to_marc_spark.tables import load

    out = q("position_based_attribution").agg(
        F.sum("credit_bps").alias("total")).collect()[0]["total"]
    ev = load(spark, SF_SMOKE, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("c"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("p"))
    n = (buys.join(clicks, "user_id")
         .where((F.col("c") < F.col("p"))
                & (F.col("c") >= F.col("p") - _PBA_LOOKBACK_US))
         .select("pid").distinct().count())
    assert out == 10_000 * n


def test_prefix_filter_join_is_exact_no_false_negatives(spark, q, duck):
    # the prefix filter must yield EXACTLY the threshold pairs a
    # brute-force all-pairs Jaccard produces (t = 1/2)
    got = {(r["ida"], r["idb"]) for r in
           q("prefix_filter_jaccard_join").collect()}
    brute = duck.execute("""
        WITH toks AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct(regexp_split_to_array(
                     trim(lower(text)), '\\s+'))) AS w
          FROM documents
        ), ne AS (SELECT doc_id, w FROM toks WHERE w <> ''),
        sizes AS (SELECT doc_id, count(*) AS sz FROM ne GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
          FROM ne a JOIN ne b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.ida, i.idb FROM inter i
        JOIN sizes sa ON i.ida = sa.doc_id
        JOIN sizes sb ON i.idb = sb.doc_id
        WHERE 3 * i.i >= sa.sz + sb.sz
    """).fetchall()
    assert got == set(map(tuple, brute))


def test_absorption_probabilities_are_probabilities(q):
    rows = {r["state"]: r["p_absorb_e6"]
            for r in q("absorption_to_purchase").collect()}
    assert rows["purchase"] == 1_000_000
    assert all(0 <= v <= 1_000_000 for v in rows.values())


def test_kaplan_meier_survival_is_monotone_nonincreasing(q):
    rows = sorted(q("kaplan_meier_churn").collect(), key=lambda r: r["m"])
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    # risk sets shrink as lifetimes lengthen
    risks = [r["n_risk"] for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_gini_and_top_decile_share_are_bounded(q):
    r = q("gini_spend_concentration").collect()[0]
    assert 0.0 <= r["gini"] <= 1.0
    # top decile of spenders must hold at least ~a decile of spend
    assert 0.1 <= r["top_decile_share"] <= 1.0


def test_nested_roundtrip_agrees_everywhere(q):
    r = q("nested_roundtrip").collect()[0]
    assert r["n_agree"] == r["n_orders"] > 0


def test_zset_join_maintenance_matches_recompute(q):
    r = q("incremental_join_maintenance").collect()[0]
    assert r["n_equal"] == r["n_keys"] > 0


def test_tpch_q1_subsumes_q6_revenue_band(q):
    # Q6's discounted-revenue subset can't exceed Q1's full-scan
    # sum_disc_price total over the same cutoff-bounded fact rows
    q1 = q("pricing_summary_report").agg(
        F.sum("sum_disc_price").alias("t")).collect()[0]["t"]
    q6 = q("forecast_revenue_change").collect()[0]["revenue"]
    assert 0 <= q6 <= q1


def test_benford_chi2_terms_nonnegative_and_digits_cover(q):
    rows = q("benford_audit").collect()
    assert {r["d"] for r in rows} <= set(range(1, 10))
    assert all(r["chi2_term"] >= 0 for r in rows)
    assert all(r["observed"] >= 0 for r in rows)
