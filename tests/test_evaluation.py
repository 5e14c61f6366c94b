"""Unit semantics for classifier evaluation (operators/evaluation.py)."""

from __future__ import annotations

from alphavantage_etl_spark.operators.evaluation import (
    auc_score,
    calibration_bins,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "y int, p double")


def test_auc_known_values(spark):
    # perfect separation
    perfect = _scored(spark, [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    assert auc_score(perfect, "y", "p").first()["auc"] == 1.0
    # perfect anti-separation
    inverted = _scored(spark, [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)])
    assert auc_score(inverted, "y", "p").first()["auc"] == 0.0
    # all scores tied: tie correction gives exactly 0.5
    tied = _scored(spark, [(1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5)])
    r = auc_score(tied, "y", "p").first()
    assert r["auc"] == 0.5 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_hand_computed_with_partial_ties(spark):
    # scores: pos {0.9, 0.5}, neg {0.5, 0.1}
    # pairs: (0.9 vs 0.5)=1, (0.9 vs 0.1)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.1)=1
    # AUC = 3.5 / 4
    df = _scored(spark, [(1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1)])
    assert auc_score(df, "y", "p").first()["auc"] == 3.5 / 4


def test_auc_undefined_for_single_class_and_skips_nulls(spark):
    one_class = _scored(spark, [(1, 0.9), (1, 0.1)])
    r = auc_score(one_class, "y", "p").first()
    assert r["auc"] is None and r["n_neg"] == 0
    with_nulls = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (None, 0.5), (1, None)], "y int, p double"
    )
    r = auc_score(with_nulls, "y", "p").first()
    assert r["n_pos"] == 1 and r["n_neg"] == 1 and r["auc"] == 1.0


def test_calibration_bins_edges_and_rates(spark):
    rows = [(1, 0.05), (0, 0.05), (1, 0.95), (1, 1.0), (0, 0.31)]
    out = {r["bin"]: r for r in calibration_bins(
        _scored(spark, rows), "y", "p", nbins=10).collect()}
    assert out[0]["n"] == 2 and out[0]["frac_pos"] == 0.5
    assert abs(out[0]["mean_score"] - 0.05) < 1e-9
    # score 1.0 clamps into the TOP bin rather than bin 10
    assert out[9]["n"] == 2 and out[9]["frac_pos"] == 1.0
    assert out[3]["n"] == 1 and out[3]["frac_pos"] == 0.0
