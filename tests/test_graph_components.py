"""Unit tests for operators/graph_queries.connected_components on
hand-built graphs — shapes (long chains, merged components) the
sf-scale oracle sweep reaches only through data coincidence."""

from __future__ import annotations

from pyspark.sql import Row

from alma_publish_to_marc_spark.operators.graph_queries import (
    connected_components,
)


def _components(spark, edges):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    return {r["node"]: r["cluster_id"]
            for r in connected_components(df).collect()}


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), pair 20-21
    out = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5),
                              (10, 11), (11, 12), (10, 12),
                              (20, 21)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_long_chain_converges(spark):
    # 40-node path: diameter ≫ 1 exercises the pointer-jumping rounds
    out = _components(spark, [(i, i + 1) for i in range(40)])
    assert set(out.values()) == {0}
    assert len(out) == 41


def test_bridged_components_merge(spark):
    # two stars whose hubs are bridged late in the id order
    edges = [(100, i) for i in range(101, 105)]
    edges += [(200, i) for i in range(201, 205)]
    edges.append((104, 204))  # bridge
    out = _components(spark, edges)
    assert set(out.values()) == {100}
    assert len(out) == 10


def test_pagerank_fixed_point_properties(spark):
    from alma_publish_to_marc_spark.operators.graph_queries import (
        PR_SCALE, pagerank_fixed_point)

    rows = pagerank_fixed_point(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = sum(r["pr_tera"] for r in rows)
    # flooring only leaks mass downward; ranks stay positive
    assert 0 < total <= PR_SCALE
    for r in rows:
        assert r["pr_tera"] > 0
        assert r["node_type"] in ("customer", "supplier")
    # suppliers aggregate many customers: the max-degree node outranks
    # the min-degree node (power iteration moves mass to hubs)
    by_deg = sorted(rows, key=lambda r: r["degree"])
    assert by_deg[-1]["pr_tera"] > by_deg[0]["pr_tera"]
    # determinism
    again = pagerank_fixed_point(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
