"""Unit semantics for in-engine hashed logistic regression
(operators/classify.py). The contract query pins the fixture-level
gradient arithmetic against the DuckDB recursive-CTE oracle; these tests
pin the LEARNING properties on crafted corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.classify import (
    predict_logreg,
    train_logreg_hashed,
)


def _corpus(spark):
    rows = [(i, "good clean prose text here", 1) for i in range(20)] + [
        (100 + i, "zzz spam junk garbage noise", 0) for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_learns_separable_data(spark):
    docs = _corpus(spark)
    w = train_logreg_hashed(docs, "doc_id", "text", "y", buckets=64, iters=5, lr=2.0)
    pred = predict_logreg(docs, w, "doc_id", "text", buckets=64)
    j = pred.join(docs.select("doc_id", "y"), on="doc_id")
    acc = j.select(
        F.avg((F.col("pred").cast("int") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc == 1.0
    # weight table is bucket-bounded: distinct tokens + bias
    assert w.count() <= 65


def test_training_partitioning_invariant(spark):
    docs = _corpus(spark)
    a = sorted(
        train_logreg_hashed(
            docs, "doc_id", "text", "y", buckets=64, iters=3
        ).collect()
    )
    b = sorted(
        train_logreg_hashed(
            docs.repartition(7, "doc_id"), "doc_id", "text", "y",
            buckets=64, iters=3,
        ).collect()
    )
    assert a == b


def test_more_iterations_more_confident(spark):
    docs = _corpus(spark)

    def mean_margin(iters):
        w = train_logreg_hashed(
            docs, "doc_id", "text", "y", buckets=64, iters=iters, lr=2.0
        )
        p = predict_logreg(docs, w, "doc_id", "text", buckets=64)
        j = p.join(docs.select("doc_id", "y"), on="doc_id")
        # margin toward the true label; rises as the full-batch loss falls
        return j.select(
            F.avg(
                F.when(F.col("y") == 1, F.col("p")).otherwise(1 - F.col("p"))
            )
        ).first()[0]

    assert mean_margin(4) > mean_margin(1)


def test_predict_unseen_tokens_fall_back_to_bias(spark):
    docs = _corpus(spark)
    w = train_logreg_hashed(docs, "doc_id", "text", "y", buckets=64, iters=3)
    novel = spark.createDataFrame(
        [(999, "wholly unseen vocabulary entirely")], "doc_id long, text string"
    )
    r = predict_logreg(novel, w, "doc_id", "text", buckets=64).first()
    assert r["p"] is not None  # unmatched buckets coalesce to weight 0


def test_rejects_zero_iterations(spark):
    with pytest.raises(ValueError, match="iters"):
        train_logreg_hashed(
            _corpus(spark), "doc_id", "text", "y", iters=0
        )
