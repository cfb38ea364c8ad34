"""Unit tests for plans/lm_queries.py (statistical LM operators)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from alma_publish_to_marc_spark.plans import lm_queries as L

SF_DIR = "/root/testdata/sf0.001"


def test_perplexity_hand_computed(spark, tmp_path):
    # corpus: "a b" x2 and "a c". unigrams: a=3, b=2(with doc text) ...
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b", "a b", "a c"],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           L.ngram_lm_perplexity(spark, str(tmp_path)).collect()}
    # model: c(a)=3, c(b)=2, c(c)=1; V=3; c(a,b)=2, c(a,c)=1
    lp_ab = math.log((2 + 1) / (3 + 3))
    lp_ac = math.log((1 + 1) / (3 + 3))
    assert out[1]["n_bigrams"] == 1
    assert out[1]["cross_entropy"] == pytest.approx(-lp_ab, abs=1e-4)
    assert out[3]["cross_entropy"] == pytest.approx(-lp_ac, abs=1e-4)
    # the rarer continuation scores strictly higher entropy
    assert out[3]["cross_entropy"] > out[1]["cross_entropy"]
    assert out[1]["perplexity"] == pytest.approx(
        math.exp(-lp_ab), abs=1e-3)


def test_perplexity_short_doc_is_null(spark, tmp_path):
    pd.DataFrame({"doc_id": [1, 2], "text": ["lonely", "two words"]}) \
        .to_parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           L.ngram_lm_perplexity(spark, str(tmp_path)).collect()}
    assert out[1]["n_bigrams"] == 0
    assert out[1]["cross_entropy"] is None
    assert out[2]["n_bigrams"] == 1


def test_perplexity_corpus_ranks_repetitive_low(spark):
    # every doc scored; entropy finite and positive on the test corpus
    rows = L.ngram_lm_perplexity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["n_bigrams"] > 0:
            assert r["cross_entropy"] is not None
            assert 0.0 < r["cross_entropy"] < 20.0
            assert r["perplexity"] == pytest.approx(
                math.exp(r["cross_entropy"]), rel=1e-3)


def test_zipf_fit_on_true_zipf_corpus(spark, tmp_path):
    # counts ~ 1/rank: term t_r appears round(1200/r) times
    words = []
    for r in range(1, 21):
        words += [f"t{r:02d}"] * round(1200 / r)
    pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]}) \
        .to_parquet(str(tmp_path / "documents.parquet"))
    row = L.token_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 20
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
    assert row["r2"] > 0.999


def test_embedding_decontamination_flags_planted(spark):
    from alma_publish_to_marc_spark.operators.similarity_queries import (
        _embedding_decontamination)
    import duckdb

    max_id = duckdb.sql(
        "select max(vec_id) from "
        "'/root/testdata/sf0.001/embeddings.parquet'").fetchone()[0]
    rows = _embedding_decontamination(spark, "/root/testdata/sf0.001") \
        .collect()
    planted = [r for r in rows if r["vec_id"] > max_id]
    assert planted
    for r in planted:
        # scaled panel copies sit at cosine 1.0 with their source
        assert r["contaminated"]
        assert r["max_benchmark_cosine"] == 1.0
        assert (r["vec_id"] - (max_id + 1)) == r["nearest_benchmark_id"]
    # untouched corpus vectors are clean on this uniform-random corpus
    clean = [r for r in rows if r["vec_id"] <= max_id]
    assert clean and all(not r["contaminated"] for r in clean)


def test_vocab_growth_monotone_and_heaps_bounds(spark):
    rows = sorted(L.vocab_growth_curve(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, L.N_DECILES + 1))
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] > a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
    # the synthetic 31-word corpus saturates instantly: beta ~ 0 (the
    # "template corpus" signature the docstring describes)
    assert 0.0 <= rows[0]["heaps_beta"] < 0.2
    assert all(r["heaps_beta"] == rows[0]["heaps_beta"] for r in rows)


def test_vocab_growth_on_growing_vocab(spark, tmp_path):
    # every doc introduces brand-new words: beta ~ 1
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(10)))
            for i in range(20)]
    pd.DataFrame(rows, columns=["doc_id", "text"]) \
        .to_parquet(str(tmp_path / "documents.parquet"))
    out = L.vocab_growth_curve(spark, str(tmp_path)).collect()
    beta = out[0]["heaps_beta"]
    assert beta == pytest.approx(1.0, abs=0.01)
