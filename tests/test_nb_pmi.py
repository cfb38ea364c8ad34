"""Naive Bayes and PMI collocation properties beyond the oracle gate."""

import pytest

from alma_publish_to_marc_spark.functions import text_queries as TQ
from alma_publish_to_marc_spark.operators import learning as L

SF = "/root/testdata/sf0.001"


def test_nb_confusion_covers_all_test_docs(spark):
    rows = L.naive_bayes_confusion(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_test = docs.where("doc_id % 5 = 0").count()
    assert total == n_test, "every held-out doc must be classified once"
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r.true_lang for r in rows} <= langs
    assert {r.pred_lang for r in rows} <= langs


def test_nb_beats_chance(spark):
    rows = L.naive_bayes_confusion(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    n_classes = len({r.true_lang for r in rows})
    assert correct / total > 1.0 / n_classes


def test_pmi_collocations_contract(spark):
    rows = TQ._pmi_collocations(spark, SF).collect()
    assert 0 < len(rows) <= TQ.PMI_TOPK
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.c_xy >= TQ.PMI_MIN_COUNT
        assert len(r.bigram.split(" ")) == 2
        # a bigram can never occur more often than either word
        assert r.c_xy <= r.c_x and r.c_xy <= r.c_y
