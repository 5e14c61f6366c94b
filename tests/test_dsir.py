"""Unit semantics for DSIR importance weighting (operators/dsir.py).

The contract query pins the fixture-level arithmetic against the DuckDB
oracle (test_contract_queries); these tests pin the operator PROPERTIES
on crafted corpora: target-like documents outrank off-distribution ones,
weights are partitioning-invariant, and the Gumbel resample is
deterministic and weight-monotone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_feature_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    target = _docs(
        spark,
        [(100 + i, "alpha beta gamma delta alpha beta") for i in range(5)],
    )
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),      # in-distribution
            (2, "zig zag zog zug"),             # out-of-distribution
            (3, "alpha beta zig zag"),          # mixed
        ],
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, "doc_id", "text").collect()
    }
    assert w[1] > w[3] > w[2]
    assert w[1] > 0 and w[2] < 0


def test_weights_partitioning_invariant(spark):
    target = _docs(spark, [(100, "a b c d e f g h")])
    raw = _docs(
        spark, [(i, f"a b tok{i} tok{i * 7} c") for i in range(40)]
    )
    base = sorted(
        dsir_log_weights(raw, target, "doc_id", "text").collect()
    )
    shuffled = sorted(
        dsir_log_weights(
            raw.repartition(7, "doc_id"), target, "doc_id", "text"
        ).collect()
    )
    assert base == shuffled


def test_feature_counts_bounded_by_buckets(spark):
    docs = _docs(spark, [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(200)])
    cnt = hashed_feature_counts(docs, "text", buckets=16)
    assert cnt.count() <= 16
    total = cnt.agg(F.sum("cnt")).first()[0]
    assert total == 600  # every token lands in exactly one bucket


def test_resample_deterministic_and_weight_monotone(spark):
    target = _docs(spark, [(100, "alpha beta gamma delta")])
    raw = _docs(
        spark,
        [(i, "alpha beta gamma delta") for i in range(10)]
        + [(i, "zig zag zog zug") for i in range(10, 40)],
    )
    w = dsir_log_weights(raw, target, "doc_id", "text")
    s1 = sorted(r["doc_id"] for r in dsir_resample(raw, w, "doc_id", 12).collect())
    s2 = sorted(
        r["doc_id"]
        for r in dsir_resample(
            raw.repartition(5), w, "doc_id", 12
        ).collect()
    )
    assert s1 == s2  # content-addressed: layout-independent
    # the heavily-upweighted in-distribution block dominates the sample
    in_dist = sum(1 for d in s1 if d < 10)
    assert in_dist >= 8


def test_scoring_third_corpus_uses_unseen_fallback(spark):
    import math

    target = _docs(spark, [(100, "alpha beta")])
    raw = _docs(spark, [(1, "gamma delta")])
    # a batch whose tokens appear in NEITHER fitted model: every bucket
    # falls back to the constant ln((N_r+B)/(N_t+B)) — finite, not null.
    # With N_t = N_r = 2 the fallback is exactly 0 per token; shift the
    # corpora sizes so it is a nonzero, predictable value.
    raw = _docs(spark, [(1, "gamma delta epsilon zeta")])  # N_r = 4
    novel = _docs(spark, [(7, "qqq www eee")])
    out = dsir_log_weights(
        raw, target, "doc_id", "text", buckets=1024, score=novel
    ).first()
    expected = 3 * round(math.log((4 + 1024) / (2 + 1024)), 9)
    assert out["n_feats"] == 3
    assert abs(out["log_weight"] - expected) < 1e-8
