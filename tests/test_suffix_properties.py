"""Property tests for the round-10 blocked suffix ranker.

The oracle gate proves Spark == DuckDB; these prove both == the
DEFINITION, on adversarial corpora hypothesis generates (tiny
alphabets force heavy repetition, ragged doc lengths, single-word
docs, identical docs). Each example writes a documents.parquet into a
tmp dir and runs the real query against a pure-Python reference.

Examples are capped low because every example is a full Spark job;
the generator's 3-word alphabet makes even 8 examples dense in
repeats (far denser than the planted-dup testdata).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

_WORDS = ["a", "bb", "ccc"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _write_docs(tmpdir: str, docs: list[list[str]]) -> str:
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)),
        "text": [" ".join(d) for d in docs],
        "lang": ["en"] * len(docs),
        "source": ["hyp"] * len(docs),
        "n_chars": [len(" ".join(d)) for d in docs],
    })
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(
        tmpdir, "documents.parquet"))
    return tmpdir


def _ref_longest_repeat(docs: list[list[str]], cap: int = 24,
                        lo: int = 2) -> dict[int, int]:
    """Per-doc longest word sequence (length in [lo, cap]) occurring
    >= 2 times across the corpus — the quadratic definition."""
    from collections import Counter

    out = {i: 0 for i in range(len(docs))}
    for ln in range(lo, cap + 1):
        counts: Counter = Counter()
        for w in docs:
            for i in range(len(w) - ln + 1):
                counts[tuple(w[i:i + ln])] += 1
        hit = False
        for di, w in enumerate(docs):
            for i in range(len(w) - ln + 1):
                if counts[tuple(w[i:i + ln])] >= 2:
                    out[di] = ln
                    hit = True
                    break
        if not hit:
            break
    return out


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_suffix_lcp_matches_definition(spark, tmp_path_factory, docs):
    from alma_publish_to_marc_spark.plans.corpus_queries import (
        suffix_lcp_repeats,
    )

    sf_dir = _write_docs(str(tmp_path_factory.mktemp("sfx")), docs)
    got = {r["doc_id"]: r["longest_rep_words"]
           for r in suffix_lcp_repeats(spark, sf_dir).collect()}
    want = _ref_longest_repeat(docs)
    assert got == want, (docs, got, want)


@settings(max_examples=6, deadline=None)
@given(_corpus)
def test_suffix_topk_counts_match_definition(spark, tmp_path_factory, docs):
    from collections import Counter

    from alma_publish_to_marc_spark.plans.corpus_queries import (
        suffix_repeat_topk,
    )

    sf_dir = _write_docs(str(tmp_path_factory.mktemp("sfxk")), docs)
    rows = suffix_repeat_topk(spark, sf_dir).collect()
    for r in rows:
        seq = tuple(r["repeat_words"].split(" "))
        assert len(seq) == r["rep_len_words"] >= 2
        counts = Counter()
        for w in docs:
            ln = len(seq)
            for i in range(len(w) - ln + 1):
                counts[tuple(w[i:i + ln])] += 1
        assert counts[seq] == r["n_occurrences"], (docs, seq, r)
    # the top length must be the corpus's true longest repeat (cap 24)
    ref = _ref_longest_repeat(docs)
    best = max(ref.values())
    if best >= 2:
        assert rows and max(r["rep_len_words"] for r in rows) == best
    else:
        assert not rows


def _ref_removal(docs: list[list[str]], t: int, cap: int = 24):
    """Quadratic reference for suffix_span_removal: word j is removed
    iff covered by ANY corpus-repeated sequence of >= t words (every
    copy removed). Exercises per-SUFFIX exactness of `best` — the lcp
    test above only pins the per-doc MAX, but removal completeness
    needs every suffix's repeat length right, not just the winner's."""
    from collections import Counter

    counts_by_len = {}
    for ln in range(2, cap + 1):
        c: Counter = Counter()
        for w in docs:
            for i in range(len(w) - ln + 1):
                c[tuple(w[i:i + ln])] += 1
        counts_by_len[ln] = c
    res = []
    for w in docs:
        n = len(w)
        cov = [False] * (n + 1)  # 1-based
        for i in range(n):
            best = 0
            for ln in range(2, min(cap, n - i) + 1):
                if counts_by_len[ln][tuple(w[i:i + ln])] >= 2:
                    best = ln
            if best >= t:
                for j in range(i + 1, i + best + 1):
                    cov[j] = True
        kept = [w[j - 1] for j in range(1, n + 1) if not cov[j]]
        runs = sum(1 for j in range(1, n + 1)
                   if cov[j] and not cov[j - 1])
        res.append((n, sum(cov[1:]), runs, " ".join(kept)))
    return res


@settings(max_examples=6, deadline=None)
@given(_corpus)
def test_suffix_span_removal_matches_definition(spark, tmp_path_factory,
                                                docs):
    from alma_publish_to_marc_spark.plans.corpus_queries import (
        _SFX_RM_T,
        suffix_span_removal,
    )

    sf_dir = _write_docs(str(tmp_path_factory.mktemp("sfxrm")), docs)
    got = {r["doc_id"]: (r["n_words"], r["n_removed"],
                         r["n_spans_removed"], r["clean_text"])
           for r in suffix_span_removal(spark, sf_dir).collect()}
    want = dict(enumerate(_ref_removal(docs, t=_SFX_RM_T)))
    assert got == want, (docs, got, want)
