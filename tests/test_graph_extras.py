"""Label-propagation and triangle-census structural properties."""

import pytest

from alma_publish_to_marc_spark.operators import graph_queries as G

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lp(spark):
    return G.label_propagation(spark, SF).collect()


def test_seeds_keep_their_labels(lp):
    for r in lp:
        if r.is_seed:
            assert r.pred_label == r.true_label
            assert r.correct == 1


def test_labels_spread_beyond_seeds(lp):
    non_seed_labeled = [r for r in lp if not r.is_seed
                        and r.pred_label is not None]
    assert non_seed_labeled, "propagation must reach non-seed nodes"
    labels = {r.true_label for r in lp}
    assert all(r.pred_label in labels for r in non_seed_labeled)


def test_every_corpus_node_present_once(lp, spark):
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(lp) == n
    assert len({r.vec_id for r in lp}) == n


def test_triangle_census_invariants(spark):
    row = G.knn_triangles(spark, SF).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    # every triangle contains 3 wedges; 3T can never exceed total wedges
    assert 3 * row.n_triangles <= row.n_wedges
    assert 0.0 <= row.clustering_coeff <= 1.0
