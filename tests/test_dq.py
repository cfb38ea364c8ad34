"""DQ audit and snapshot-diff properties beyond the oracle gate."""

import pytest

from alma_publish_to_marc_spark.plans import dq_queries as DQ

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audit(spark):
    return {(r.table_name, r.check_name): r
            for r in DQ.dq_constraint_audit(spark, SF).collect()}


def test_audit_emits_all_rules(audit):
    assert len(audit) == 13
    for r in audit.values():
        assert r.n_rows > 0
        assert 0 <= r.n_violations <= r.n_rows
        assert r.passed == (1 if r.n_violations == 0 else 0)


def test_audit_known_good_rules_pass(audit):
    # the driver generator is clean on these by construction
    for key in [("orders", "pk_unique_o_orderkey"),
                ("orders", "fk_o_custkey_in_customer"),
                ("lineitem", "fk_l_orderkey_in_orders"),
                ("documents", "text_nonempty"),
                ("events", "event_type_in_domain")]:
        assert audit[key].passed == 1, key


def test_snapshot_diff_counts_reconcile(spark):
    rows = DQ.snapshot_diff(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    by_status = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs
    # every original doc is exactly one of removed/changed/unchanged
    assert (by_status.get("removed", 0) + by_status.get("changed", 0)
            + by_status.get("unchanged", 0)) == n
    n_added = docs.where("doc_id % 13 = 0").count()
    assert by_status.get("added", 0) == n_added
    n_removed = docs.where("doc_id % 11 = 0").count()
    assert by_status.get("removed", 0) == n_removed
    # changed = revised and not removed
    n_changed = docs.where("doc_id % 7 = 0 AND doc_id % 11 != 0").count()
    assert by_status.get("changed", 0) == n_changed
