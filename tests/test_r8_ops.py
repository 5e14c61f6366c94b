"""Hand-value unit tests for the r8 operator families (X108-X113)."""

from __future__ import annotations

import math
from datetime import date, timedelta

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ X108 cross-correlation
def test_crosscorr_finds_planted_lead(spark):
    """b = a shifted by +2 calendar days -> r = 1.0 exactly at lag 2;
    a gap day pairs with nothing (calendar, not index, alignment)."""
    from alphavantage_etl_spark.operators.trend import cross_correlation

    # aperiodic values (hash-scrambled) so ONLY the planted lag is exact
    a_rows = [
        (
            "x",
            date(2020, 1, 1) + timedelta(days=i),
            float(100 + (i * 2654435761) % 89),
        )
        for i in range(30)
    ]
    a = spark.createDataFrame(a_rows, "g string, d date, v double").drop("g")
    b = a.select(F.date_add("d", 2).alias("d"), "v")
    got = {
        r["lag"]: r
        for r in cross_correlation(a, b, "d", "v", max_lag=3).collect()
    }
    assert got[2]["r"] == 1.0
    # b IS a shifted by +2: at lag 2 every a-date pairs -> all 30
    assert got[2]["n_pairs"] == 30
    assert got[3]["n_pairs"] == 29  # one calendar day slides out
    assert all(
        abs(got[l]["r"]) < 1.0 for l in got if l != 2 and got[l]["r"]
    )
    # constant side -> NULL r
    c = spark.createDataFrame(
        [(date(2020, 1, 1) + timedelta(days=i), 5.0) for i in range(30)],
        "d date, v double",
    )
    rc = cross_correlation(a, c, "d", "v", max_lag=1).collect()
    assert all(r["r"] is None for r in rc)


# ------------------------------------------------ X109 average precision
def test_average_precision_hand_value(spark):
    """Distinct scores, y = [1, 0, 1] by rank -> AP = (1 + 2/3)/2."""
    from alphavantage_etl_spark.operators.evaluation import average_precision

    df = spark.createDataFrame(
        [(1, 1, 0.9), (2, 0, 0.8), (3, 1, 0.7)], "id long, y int, p double"
    )
    r = average_precision(df, "y", "p", "id").first()
    assert (r["n_pos"], r["n"]) == (2, 3)
    assert r["avg_precision"] == pytest.approx((1.0 + 2.0 / 3.0) / 2, abs=1e-9)
    # all negatives -> NULL
    neg = spark.createDataFrame([(1, 0, 0.5)], "id long, y int, p double")
    assert average_precision(neg, "y", "p", "id").first()["avg_precision"] is None


def test_average_precision_tie_block_uses_pinned_order(spark):
    """Equal scores order by the tiebreak: ids 1..4 at one score with
    y = [1, 1, 0, 0] -> AP = (1 + 1)/2 = 1.0; reversed labels under the
    same ties -> AP = (1/3 + 2/4)/2."""
    from alphavantage_etl_spark.operators.evaluation import average_precision

    a = spark.createDataFrame(
        [(1, 1, 0.5), (2, 1, 0.5), (3, 0, 0.5), (4, 0, 0.5)],
        "id long, y int, p double",
    )
    assert average_precision(a, "y", "p", "id").first()[
        "avg_precision"
    ] == pytest.approx(1.0, abs=1e-9)
    b = spark.createDataFrame(
        [(1, 0, 0.5), (2, 0, 0.5), (3, 1, 0.5), (4, 1, 0.5)],
        "id long, y int, p double",
    )
    assert average_precision(b, "y", "p", "id").first()[
        "avg_precision"
    ] == pytest.approx((1.0 / 3 + 2.0 / 4) / 2, abs=1e-9)


# ------------------------------------------------ X110 MRR / hit@k
def test_mrr_hits_hand_values_and_miss_penalty(spark):
    from alphavantage_etl_spark.operators.evaluation import mrr_hits

    ranked = spark.createDataFrame(
        [("q1", i, i + 1) for i in range(10)]
        + [("q2", i, i + 1) for i in range(10)]
        + [("q3", i, i + 1) for i in range(10)],
        "q string, doc long, rank long",
    )
    # q1 first hit at rank 4, q2 at rank 1, q3 has NO relevant doc
    rels = spark.createDataFrame(
        [("q1", 3, 1), ("q2", 0, 2), ("q3", 99, 1)],
        "q string, doc long, rel int",
    )
    r = mrr_hits(ranked, rels, "q", "doc", "rank", "rel").first()
    assert r["n_queries"] == 3
    assert r["mrr"] == pytest.approx((0.25 + 1.0 + 0.0) / 3, abs=1e-9)
    assert r["hit_1"] == pytest.approx(1 / 3)
    assert r["hit_5"] == pytest.approx(2 / 3)
    assert r["hit_10"] == pytest.approx(2 / 3)


# ------------------------------------------------ X111 silhouette
def test_silhouette_separated_overlapping_and_single_label(spark):
    from alphavantage_etl_spark.operators.similarity import (
        silhouette_by_label,
    )

    # every point ON its own centroid -> a = 0, s = 1.0 exactly
    tight = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in range(5)]
        + [(i + 10, [0.0, 1.0], 1) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["label"]: r for r in silhouette_by_label(tight).collect()
    }
    assert out[0]["mean_silhouette"] == 1.0
    assert out[1]["mean_silhouette"] == 1.0
    assert out[0]["n"] == 5

    # a point nearer the FOREIGN centroid scores negative
    noisy = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.0, 1.0], 1),
         (4, [0.1, 0.9], 1), (5, [0.05, 0.95], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = silhouette_by_label(noisy).collect()
    assert any(r["mean_silhouette"] < 1.0 for r in rows)

    single = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.5, 0.5], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r = silhouette_by_label(single).first()
    assert r["mean_silhouette"] is None and r["n"] == 0


# ------------------------------------------------ X112 source overlap
def test_source_overlap_counts_and_coefficient(spark):
    from alphavantage_etl_spark.operators.dedup import source_overlap_matrix

    rows = (
        [(f"f{i}", "A") for i in range(10)]
        + [(f"f{i}", "B") for i in range(2)]  # B shares f0, f1
        + [("g0", "B"), ("g1", "B")]
        + [("f0", "A")]  # duplicate (fp, src) row must not inflate
    )
    df = spark.createDataFrame(rows, "fp string, src string")
    out = source_overlap_matrix(df, "fp", "src").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert (r["shared_fps"], r["docs_a"], r["docs_b"]) == (2, 10, 4)
    assert r["overlap_coef"] == pytest.approx(0.5)
    # disjoint sources -> empty matrix
    dj = spark.createDataFrame(
        [("x", "A"), ("y", "B")], "fp string, src string"
    )
    assert source_overlap_matrix(dj, "fp", "src").count() == 0


# ------------------------------------------------ X113 conformal
def test_conformal_k_formula_and_degenerate_residuals(spark):
    from alphavantage_etl_spark.operators.experiment import (
        conformal_coverage,
    )

    # constant value per group -> every residual 0 -> q_hat = 0,
    # coverage exactly 1.0
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", 100.0 + (i % 3)) for i in range(400)],
        "id long, g string, v double",
    )
    r = conformal_coverage(df, "id", "g", "v", alpha=0.1).first()
    assert r["q_hat"] == 0.0 and r["coverage"] == 1.0
    assert r["k"] == math.ceil((r["n_calib"] + 1) * 0.9)
    assert r["n_train"] + r["n_calib"] + r["n_test"] == 400

    with pytest.raises(ValueError):
        conformal_coverage(df, "id", "g", "v", alpha=0.0)


def test_conformal_coverage_tracks_target(spark):
    """iid noise: empirical test coverage lands near 1 - alpha (the
    finite-sample guarantee is >= 1 - alpha in expectation; allow
    sampling slack)."""
    from alphavantage_etl_spark.operators.experiment import (
        conformal_coverage,
    )

    rows = [
        (i, "g", 100.0 + ((i * 2654435761) % 97) / 10.0) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    r = conformal_coverage(df, "id", "g", "v", alpha=0.1).first()
    assert 0.85 <= r["coverage"] <= 1.0
    assert r["q_hat"] > 0
