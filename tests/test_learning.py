"""Unit tests for operators/learning.py (fixed-point logistic trainer)."""

from __future__ import annotations

import pandas as pd

from alma_publish_to_marc_spark.operators import learning as L


def test_logreg_learns_separable_labels(spark, tmp_path):
    # en docs are long, others short: perfectly separable by n_chars
    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "lang": "en",
                     "text": " ".join(["word"] * 180), "n_chars": 900})
        rows.append({"doc_id": 100 + i, "lang": "de",
                     "text": " ".join(["w"] * 20), "n_chars": 40})
    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    out = L.logreg_train(docs, n_rounds=6).collect()[0]
    assert out["n_examples"] == 20
    # longer docs are the positive class: chars weight learned positive
    assert out["w_chars"] > 0
    assert out["train_accuracy"] >= 0.9


def test_logreg_deterministic(spark):
    from alma_publish_to_marc_spark.operators.learning import _logreg_query

    a = _logreg_query(spark, "/root/testdata/sf0.001").collect()
    b = _logreg_query(spark, "/root/testdata/sf0.001").collect()
    assert a == b
