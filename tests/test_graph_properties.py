"""Property test: distributed connected components must agree with a
driver-side union-find on arbitrary small graphs (random shapes reach
merge orders the fixed unit-test graphs don't)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from alma_publish_to_marc_spark.operators.graph_queries import (
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {n: find(n) for n in parent}


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=25)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edge_lists)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def _brute_support(edges):
    es = {tuple(sorted(e)) for e in edges}
    nbr = {}
    for a, b in es:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    return {(a, b): len(nbr[a] & nbr[b]) for a, b in es}


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edge_lists)
def test_triangle_support_matches_brute_force(spark, edges):
    from alma_publish_to_marc_spark.operators.graph_queries import (
        triangle_support,
    )
    es = sorted({tuple(sorted(e)) for e in edges})
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in es])
    got = {(r["a"], r["b"]): r["support"]
           for r in triangle_support(df).collect()}
    want = {e: s for e, s in _brute_support(es).items() if s > 0}
    assert got == want
