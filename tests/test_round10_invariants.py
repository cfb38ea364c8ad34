"""Semantic invariants for the round-10 queries (blocked suffix
ranking, speculative draft policy, KV-cache planning) — the oracle gate
proves cross-engine equality; these prove the answers make sense,
including a pure-pandas brute-force recount of the suffix top-10."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _word_lists() -> list[list[str]]:
    pdf = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    return [t.strip().split() for t in pdf["text"] if t.strip()]


def test_suffix_lcp_dominates_8gram_runs(spark):
    """If the fixed-8-gram method sees a duplicated run of L >= 8 words
    in a doc, the suffix method must report >= min(L, 24) for that doc
    (it sees the same repeat without the 8-gram quantization); and the
    suffix method never reports 1 (minimum reported repeat is 2)."""
    from alma_publish_to_marc_spark.plans.corpus_queries import (
        longest_dup_span,
        suffix_lcp_repeats,
    )

    sfx = {r["doc_id"]: r["longest_rep_words"]
           for r in suffix_lcp_repeats(spark, SF).collect()}
    gram = {r["doc_id"]: r["longest_dup_words"]
            for r in longest_dup_span(spark, SF).collect()}
    assert set(sfx) == set(gram)
    assert any(v >= 8 for v in gram.values())  # testdata plants dups
    for doc, g in gram.items():
        if g >= 8:
            assert sfx[doc] >= min(g, 24), (doc, g, sfx[doc])
        assert sfx[doc] != 1


def test_suffix_topk_counts_match_bruteforce(spark):
    """Every reported top sequence must occur exactly n_occurrences
    times as a word-level sliding window over the corpus (counted
    brute-force in pandas — engine-independent ground truth)."""
    from alma_publish_to_marc_spark.plans.corpus_queries import (
        suffix_repeat_topk,
    )

    rows = suffix_repeat_topk(spark, SF).collect()
    assert 1 <= len(rows) <= 10
    docs = _word_lists()
    for r in rows:
        seq = tuple(r["repeat_words"].split(" "))
        ln = r["rep_len_words"]
        assert len(seq) == ln >= 2
        brute = sum(
            1
            for w in docs
            for i in range(len(w) - ln + 1)
            if tuple(w[i:i + ln]) == seq
        )
        assert brute == r["n_occurrences"], (seq, brute, r["n_occurrences"])
        assert r["n_occurrences"] >= 2


def test_suffix_topk_is_the_longest(spark):
    """The reported max length must equal the corpus's true longest
    repeated word sequence (capped at 24), verified brute-force over
    all window lengths via a hash-count sweep."""
    from alma_publish_to_marc_spark.plans.corpus_queries import (
        suffix_repeat_topk,
    )

    rows = suffix_repeat_topk(spark, SF).collect()
    got = max(r["rep_len_words"] for r in rows)
    docs = _word_lists()

    def repeats_at(ln: int) -> bool:
        seen: set = set()
        for w in docs:
            for i in range(len(w) - ln + 1):
                key = tuple(w[i:i + ln])
                if key in seen:
                    return True
                seen.add(key)
        return False

    assert repeats_at(got)
    if got < 24:
        assert not repeats_at(got + 1)


def test_draft_policy_curve_shape(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _speculative_draft_policy,
    )

    rows = sorted(_speculative_draft_policy(spark, SF).collect(),
                  key=lambda r: r["k"])
    assert [r["k"] for r in rows] == list(range(1, 9))
    p = rows[0]["accept_e6"]
    assert 0 < p < 1_000_000  # a bigram draft is neither useless nor perfect
    assert all(r["accept_e6"] == p for r in rows)
    # E_k strictly increases with k while p > 0, with DIMINISHING
    # increments (the increments are p^k, decreasing in k)
    exps = [r["exp_accept_e6"] for r in rows]
    incs = [b - a for a, b in zip([0] + exps[:-1], exps)]
    assert incs[0] == p
    assert all(0 <= b <= a for a, b in zip(incs, incs[1:]))
    assert all(r["tokens_per_round_e6"] == r["exp_accept_e6"] + 1_000_000
               for r in rows)
    assert all(r["speedup_e6"] > 0 for r in rows)


def test_kv_budget_table_consistency(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _KV_BYTES_PER_TOKEN,
        _KV_HBM_BUDGET,
        _kv_cache_memory_budget,
    )

    rows = sorted(_kv_cache_memory_budget(spark, SF).collect(),
                  key=lambda r: r["context_cap"])
    assert [r["context_cap"] for r in rows] == [128, 256, 512, 1024]
    for r in rows:
        assert r["kv_bytes_mean"] <= r["kv_bytes_max"] \
            <= _KV_BYTES_PER_TOKEN * r["context_cap"]
        # paged overcommit headroom: expected batch >= worst-case batch
        assert r["batch_expected"] >= r["batch_worst_case"] > 0
        assert r["batch_worst_case"] == _KV_HBM_BUDGET // (
            _KV_BYTES_PER_TOKEN * r["context_cap"])
    # a larger cap can only clip less -> mean footprint nondecreasing
    means = [r["kv_bytes_mean"] for r in rows]
    assert means == sorted(means)


def test_paged_fragmentation_monotone_in_page_size(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _PAGE_MAX_LEN,
        _paged_attention_fragmentation,
    )

    rows = sorted(_paged_attention_fragmentation(spark, SF).collect(),
                  key=lambda r: r["page_size"])
    assert [r["page_size"] for r in rows] == [8, 16, 32, 64]
    for r in rows:
        # last-page waste is < one page per request
        assert 0 <= r["frag_tok"] < r["n_requests"] * r["page_size"]
        assert r["frag_tok"] == r["pages_total"] * r["page_size"] \
            - r["tok_total"]
        # paged beats the contiguous reservation on waste at every P
        # (requests are far shorter than the reservation cap here)
        assert r["frag_share_e6"] < r["contig_waste_share_e6"] \
            or r["contig_waste_share_e6"] == 0
        assert 0 <= r["contig_waste_share_e6"] < 1_000_000
        # contiguous waste is page-size independent; tok_total confirms
        # both allocators priced the same clipped requests
        assert r["tok_total"] <= r["n_requests"] * _PAGE_MAX_LEN
    # allocated bytes in doubling block sizes only grow: multiples of 2P
    # are a subset of multiples of P
    frag = [r["frag_tok"] for r in rows]
    assert frag == sorted(frag)


def test_matryoshka_recall_is_a_valid_gate(spark):
    from alma_publish_to_marc_spark.operators.similarity_queries import (
        K,
        _mrl_recall,
        _mrl_topk,
    )

    topk = _mrl_topk(spark, SF).collect()
    per_q: dict = {}
    for r in topk:
        per_q.setdefault(r["qid"], []).append(r)
    for qid, rows in per_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == list(range(1, K + 1))
        cos = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cos == sorted(cos, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cos)
    rec = _mrl_recall(spark, SF).collect()
    assert len(rec) == len(per_q) == 5
    for r in rec:
        assert r["n_exact"] == K
        assert 0 <= r["mrl_hits"] <= K
        assert abs(r["mrl_recall"] - r["mrl_hits"] / K) < 1e-9
    # a 16-of-64-dim prefix must retain SOME signal: not every list empty
    assert sum(r["mrl_hits"] for r in rec) > 0


def test_queue_wait_curve_shape(spark):
    from alma_publish_to_marc_spark.plans.posttrain_queries import (
        _serving_queue_wait_curve,
    )

    rows = sorted(_serving_queue_wait_curve(spark, SF).collect(),
                  key=lambda r: r["replicas"])
    assert [r["replicas"] for r in rows] == [1, 2, 4, 8, 16]
    # rho halves (floor) as replicas double; waits strictly improve
    # while unsaturated; a saturated candidate reports -1
    rhos = [r["rho_e6"] for r in rows]
    assert rhos == sorted(rhos, reverse=True)
    for a, b in zip(rows, rows[1:]):
        assert abs(b["rho_e6"] - a["rho_e6"] // 2) <= 1
        if a["wait_us"] != -1 and b["wait_us"] != -1:
            assert b["wait_us"] <= a["wait_us"]
        if a["wait_us"] == -1:
            assert a["rho_e6"] >= 1_000_000
    # the largest candidate must be unsaturated on this data
    assert rows[-1]["wait_us"] >= 0
