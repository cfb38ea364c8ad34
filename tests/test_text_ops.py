"""Unit + property tests for the training-pipeline text operators that
the oracle sweep exercises only on the driver corpus: BPE-ish token
estimation, PII redaction, decontamination shingles, repetition stats.
Property tests pin the Spark column expressions to plain-Python
references over adversarial strings (the corpus is tame ASCII)."""

from __future__ import annotations

import pytest

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from alma_publish_to_marc_spark.functions import text as T
from alma_publish_to_marc_spark.functions.text_queries import (
    _DECON_N, _RE_EMAIL, _RE_IP, _RE_PHONE, _shingles)


def _bpe_ref(s: str) -> int:
    toks = re.findall(T.BPE_PRETOKEN_RE, s.lower())
    return sum(max(1, math.ceil(len(t) / 4)) for t in toks)


# printable ASCII incl. whitespace runs; the corpus never leaves ASCII
_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=120)


@settings(max_examples=30, deadline=None)
@given(st.lists(_ascii, min_size=1, max_size=8))
def test_bpe_estimate_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(texts)],
                               "i: long, s: string")
    got = {r["i"]: r["n"] for r in
           df.select("i", T.bpe_token_estimate(F.col("s")).alias("n")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _bpe_ref(s), (s, got[i], _bpe_ref(s))


def test_bpe_estimate_known_values(spark):
    df = spark.createDataFrame([
        Row(s="the cat sat"),            # 3 short words -> 3
        Row(s="internationalization"),   # 20 chars -> ceil(20/4) = 5
        Row(s="a1b2"),                   # alternating runs: a,1,b,2 -> 4
        Row(s=""),                       # no pretokens -> 0
    ])
    out = [r["n"] for r in
           df.select(T.bpe_token_estimate(F.col("s")).alias("n")).collect()]
    assert out == [3, 5, 4, 0]


def test_pii_regexes_redact_and_count(spark):
    dirty = ("reach me at bob99@corp.com or +1-555-0199, "
             "backup node 10.0.42.1 always on")
    df = spark.createDataFrame([Row(s=dirty)])
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE, "<PHONE>"),
        _RE_IP, "<IP>")
    row = df.select(
        red.alias("red"),
        F.regexp_count(F.col("s"), F.lit(_RE_EMAIL)).alias("e"),
        F.regexp_count(F.col("s"), F.lit(_RE_PHONE)).alias("p"),
        F.regexp_count(F.col("s"), F.lit(_RE_IP)).alias("i")).collect()[0]
    assert row["red"] == ("reach me at <EMAIL> or <PHONE>, "
                          "backup node <IP> always on")
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)


def test_shingles_slide_and_short_docs_empty(spark):
    df = spark.createDataFrame([
        Row(i=0, s=" ".join(f"w{k}" for k in range(_DECON_N + 2))),
        Row(i=1, s="too short"),
    ], "i: long, s: string")
    got = {r["i"]: r["sh"] for r in
           df.select("i", _shingles(F.col("s"), _DECON_N).alias("sh")).collect()}
    assert len(got[0]) == 3  # n+2 words -> 3 sliding windows
    assert got[0][0] == " ".join(f"w{k}" for k in range(_DECON_N))
    assert got[0][-1] == " ".join(f"w{k}" for k in range(2, _DECON_N + 2))
    assert got[1] == []


def test_repetition_fractions(spark):
    # 6 words, 3 distinct -> dup_word_frac 0.5; trigrams: 4 total,
    # "a b a" repeats at positions 1 and 3 -> 3 distinct -> 0.25
    df = spark.createDataFrame([Row(s="a b a b a c")])
    words = F.split(F.trim(F.lower(F.col("s"))), r"\s+")
    n = F.size(words)
    tg = F.transform(F.sequence(F.lit(1), n - 2),
                     lambda i: F.array_join(F.slice(words, i, 3), " "))
    row = df.select(
        F.round(1 - F.size(F.array_distinct(words)) / n, 4).alias("dw"),
        F.round(1 - F.size(F.array_distinct(tg)) / F.size(tg), 4).alias("dt"),
    ).collect()[0]
    assert row["dw"] == 0.5
    assert row["dt"] == 0.25


def test_preference_pairs_are_strictly_ordered(spark):
    from alma_publish_to_marc_spark.functions.text_queries import (
        PREF_PAIRS_PER_SOURCE, _preference_pairs)

    rows = _preference_pairs(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["quality_gap"] > 0
        assert r["chosen_doc"] != r["rejected_doc"]
        assert 1 <= r["pair_rank"] <= PREF_PAIRS_PER_SOURCE
    # at most K pairs per source
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert all(n <= PREF_PAIRS_PER_SOURCE for n in per_src.values())


def test_split_leakage_detects_cross_split_neardups(spark):
    from alma_publish_to_marc_spark.operators.dedup_queries import (
        _split_leakage)

    rows = _split_leakage(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["crosses_split"] == (r["split_a"] != r["split_b"])
        assert r["n_pairs"] > 0


def test_quality_calibration_is_source_local_percentile(spark):
    from alma_publish_to_marc_spark.functions.text_queries import (
        _quality_calibrated)

    rows = _quality_calibrated(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        assert 0.0 <= r["quality_calibrated"] <= 1.0
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["quality"], r["doc_id"]))
        # percentile ranks are monotone in raw quality within a source
        for a, b in zip(rs, rs[1:]):
            if b["quality"] > a["quality"]:
                assert b["quality_calibrated"] > a["quality_calibrated"]
            elif b["quality"] == a["quality"]:
                assert b["quality_calibrated"] == a["quality_calibrated"]
        # the worst doc of every source sits at rank 0
        assert rs[0]["quality_calibrated"] == 0.0


def test_lang_id_confusion_shares_normalize(spark):
    from alma_publish_to_marc_spark.functions.text_queries import (
        _lang_id_confusion)

    rows = _lang_id_confusion(spark, "/root/testdata/sf0.01").collect()
    assert rows
    per_true: dict[str, float] = {}
    n_total = 0
    for r in rows:
        per_true[r["true_lang"]] = per_true.get(r["true_lang"], 0.0) \
            + r["share_of_true"]
        n_total += r["n"]
    for lang, total in per_true.items():
        assert total == pytest.approx(1.0, abs=1e-2), lang
    assert n_total == 500  # every document lands in exactly one cell
