"""Tests for multi-probe LSH and the ANN recall-evaluation query."""

from __future__ import annotations

from alma_publish_to_marc_spark.operators import similarity as S
from alma_publish_to_marc_spark.operators import similarity_queries as SQ

SF_DIR = "/root/testdata/sf0.001"


def test_probe_masks_form_hamming_ball():
    masks = S.probe_masks(8, 2)
    assert len(masks) == 1 + 8 + 28
    assert len(set(masks)) == len(masks)
    assert all(0 <= m < 2**8 for m in masks)
    assert all(bin(m).count("1") <= 2 for m in masks)
    # radius 0 collapses to the identity probe
    assert S.probe_masks(8, 0) == [0]


def test_multiprobe_superset_of_single_bucket(spark, monkeypatch):
    """Radius-2 probing must return candidates at least as good as a
    radius-0 single-bucket probe: every query retrieves a superset of
    the single-bucket neighbors, and ranking is exact cosine."""
    from alma_publish_to_marc_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    out = S.lsh_topk(emb, "vec_id", "embedding", SQ.QUERY_IDS, SQ.K)
    rows = out.collect()

    # radius-0 baseline through the same code path
    monkeypatch.setattr(S, "PROBE_RADIUS", 0)
    base = S.lsh_topk(emb, "vec_id", "embedding", SQ.QUERY_IDS, SQ.K).collect()
    monkeypatch.undo()

    multi = {}
    for r in rows:
        multi.setdefault(r["qid"], set()).add(r["neighbor_id"])
    single = {}
    for r in base:
        single.setdefault(r["qid"], set()).add(r["neighbor_id"])
    # a multi-probe top-k candidate pool contains the single-bucket pool,
    # so per query: at least as many neighbors, and any single-bucket
    # neighbor missing from multi's top-k was outranked by a better one
    for qid, s_ids in single.items():
        assert len(multi.get(qid, set())) >= len(s_ids), qid
    assert sum(len(v) for v in multi.values()) \
        > sum(len(v) for v in single.values())

    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r)
    for qid, rs in per_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)), qid
        cosines = [x["cosine"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True), qid


def test_recall_eval_bounds(spark):
    rows = SQ._recall_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] >= 1
        assert 0 <= r["lsh_hits"] <= r["n_exact"]
        assert 0 <= r["ivf_hits"] <= r["n_exact"]
        assert 0.0 <= r["lsh_recall"] <= 1.0
        assert 0.0 <= r["ivf_recall"] <= 1.0


def test_center_normalize_unit_vectors(spark):
    rows = SQ._center_normalize(spark, SF_DIR).collect()
    assert rows
    for r in rows[:20]:
        vals = [float(x) for x in r["unit_csv"].split(",")]
        assert len(vals) == S.DIM
        n = sum(v * v for v in vals) ** 0.5
        # unit length up to the 6-dp component rounding
        assert abs(n - 1.0) < 1e-3, (r["vec_id"], n)
        assert r["norm_centered"] > 0


def test_refined_quantizer_beats_seed_quantizer_on_mean_recall(spark):
    """The measured-improvement claim in ivf_topk's docstring: 2 Lloyd
    rounds must not lose recall vs the raw seed cells on the fixed
    panel (strictly better on this dataset: 0.30 -> 0.40)."""
    rows = SQ._recall_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["ivf_refined_hits"] <= r["n_exact"]
        assert 0.0 <= r["ivf_refined_recall"] <= 1.0
    mean_seed = sum(r["ivf_recall"] for r in rows) / len(rows)
    mean_ref = sum(r["ivf_refined_recall"] for r in rows) / len(rows)
    assert mean_ref >= mean_seed


def test_semantic_dedup_drops_injected_copies(spark):
    import duckdb

    from alma_publish_to_marc_spark.operators import similarity_queries as SQ

    max_orig = duckdb.sql(
        "select max(vec_id) from '/root/testdata/sf0.001/embeddings.parquet'"
    ).fetchone()[0]
    rows = SQ._semantic_dedup(spark, "/root/testdata/sf0.001").collect()
    injected = [r for r in rows if r["vec_id"] > max_orig]
    assert injected, "augmented corpus must add scaled copies"
    # every injected copy is dropped in favor of its lower-id source
    for r in injected:
        assert not r["kept"]
        assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
    # the flag is exactly "no lower-id near-dup cell-mate"
    for r in rows:
        assert r["kept"] == (r["dup_of"] is None)


def test_pq_codes_and_adc_shape(spark):
    from alma_publish_to_marc_spark.operators import similarity as S
    from alma_publish_to_marc_spark.operators import similarity_queries as SQ
    from alma_publish_to_marc_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = [int(r["vec_id"]) for r in
             emb.select("vec_id").orderBy("vec_id").limit(S.PQ_KSUB).collect()]
    codes = {r["vec_id"]: r for r in
             S.pq_encode(emb, "vec_id", "embedding", seeds).collect()}
    # every vector gets a full code tuple drawn from the seed set
    assert len(codes) == emb.count()
    for r in codes.values():
        for m in range(1, S.PQ_M + 1):
            assert r[f"c{m}"] in seeds
    # a seed vector's own code is itself in every subspace (distance 0)
    for s in seeds:
        for m in range(1, S.PQ_M + 1):
            assert codes[s][f"c{m}"] == s

    top = SQ._pq_adc(spark, "/root/testdata/sf0.001").collect()
    per_q = {}
    for r in top:
        per_q.setdefault(r["qid"], []).append(r)
        assert r["adc_dist"] >= 0.0
    for qid, rows in per_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        ds = [r["adc_dist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ds == sorted(ds)


def test_pq_rerank_recovers_recall(spark):
    """Two-stage (ADC shortlist -> exact rerank) must beat plain ADC
    recall@10 against the exact baseline, measuring the compressed
    index's real serving quality."""
    from alma_publish_to_marc_spark.operators import similarity as S
    from alma_publish_to_marc_spark.operators import similarity_queries as SQ
    from alma_publish_to_marc_spark.tables import load

    sf = "/root/testdata/sf0.01"
    emb = load(spark, sf, "embeddings")
    exact = {(r["qid"], r["neighbor_id"]) for r in S.brute_force_topk(
        emb, "vec_id", "embedding", SQ.QUERY_IDS, SQ.K).collect()}
    adc = {(r["qid"], r["neighbor_id"]) for r in S.pq_adc_topk(
        emb, "vec_id", "embedding", SQ.QUERY_IDS, SQ.PQ_SEED_IDS,
        SQ.K).collect()}
    rer = {(r["qid"], r["neighbor_id"]) for r in SQ._pq_rerank(
        spark, sf).collect()}
    recall_adc = len(exact & adc) / len(exact)
    recall_rer = len(exact & rer) / len(exact)
    assert recall_rer > recall_adc
    assert recall_rer >= 0.2  # measured 0.26 vs 0.14 plain ADC at sf0.01
