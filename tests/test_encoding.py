"""Unit semantics for feature encoding (functions/encoding.py): smoothed
target encoding (incl. leave-one-out leakage safety) and exact-quantile
discretization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.functions.encoding import (
    quantile_discretize,
    target_encode,
)


def test_target_encode_known_values(spark):
    # category A: targets 10, 20 (n=2, sum=30); B: 40 (n=1); mu = 70/3
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 40.0)],
        "id long, cat string, y double",
    )
    out = {
        r["id"]: r
        for r in target_encode(df, "cat", "y", smoothing=2.0, loo=True).collect()
    }
    mu = 70.0 / 3
    assert abs(out[1]["enc"] - (30 + 2 * mu) / 4) < 1e-12
    assert abs(out[3]["enc"] - (40 + 2 * mu) / 3) < 1e-12
    # leave-one-out removes the row's own label
    assert abs(out[1]["enc_loo"] - (20 + 2 * mu) / 3) < 1e-12
    assert abs(out[2]["enc_loo"] - (10 + 2 * mu) / 3) < 1e-12
    # a singleton's LOO encoding is the pure prior
    assert abs(out[3]["enc_loo"] - (0 + 2 * mu) / 2) < 1e-12


def test_target_encode_loo_blocks_self_leakage(spark):
    # two categories perfectly separate the target: plain enc memorizes
    # the label, LOO cannot (singleton groups collapse to the prior)
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 0.0)], "id long, cat string, y double"
    )
    out = {r["id"]: r for r in target_encode(
        df, "cat", "y", smoothing=1.0, loo=True).collect()}
    assert out[1]["enc"] != out[2]["enc"]          # enc leaks
    assert out[1]["enc_loo"] == out[2]["enc_loo"]  # LOO: both = prior


def test_target_encode_null_handling(spark):
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "A", None), (4, "A", 8.0)],
        "id long, cat string, y double",
    )
    out = {r["id"]: r for r in target_encode(
        df, "cat", "y", smoothing=0.0, loo=True).collect()}
    assert abs(out[1]["enc"] - 15.0) < 1e-12  # NULL category is a level
    # NULL-target row: excluded from stats, enc_loo falls back to enc
    assert out[3]["enc"] == out[3]["enc_loo"] == 8.0
    # m=0 singleton: removing the row leaves no data AND no prior -> NULL
    assert out[4]["enc"] == 8.0 and out[4]["enc_loo"] is None


def test_target_encode_all_null_category_m0_yields_null(spark):
    # smoothing=0 and a category whose targets are ALL NULL: no data, no
    # prior -> enc must be NULL (not 0/0 = NaN under non-ANSI Spark)
    df = spark.createDataFrame(
        [(1, "A", None), (2, "A", None), (3, "B", 4.0)],
        "id long, cat string, y double",
    )
    out = {r["id"]: r for r in target_encode(
        df, "cat", "y", smoothing=0.0, loo=True).collect()}
    assert out[1]["enc"] is None and out[2]["enc"] is None
    assert out[1]["enc_loo"] is None  # NULL-target fallback follows enc
    assert out[3]["enc"] == 4.0


def test_discretize_equi_depth_and_boundary_goes_up(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id long, v double"
    )
    out = {r["id"]: r["bin"] for r in quantile_discretize(df, "v", 2).collect()}
    # median of 1..10 is 5.5; 1-5 -> bin 0, 6-10 -> bin 1
    assert [out[i] for i in range(1, 11)] == [0] * 5 + [1] * 5
    # a value exactly on the boundary lands in the UPPER bin
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "id long, v double"
    )
    out2 = {r["id"]: r["bin"] for r in quantile_discretize(df2, "v", 2).collect()}
    assert out2[5] == 1  # median of 1..9 IS 5


def test_discretize_per_group_and_nulls(spark):
    rows = [(i, "a", float(i)) for i in range(10)] + [
        (100 + i, "b", float(1000 + i)) for i in range(10)
    ] + [(999, "a", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["id"]: r["bin"] for r in quantile_discretize(
        df, "v", 5, group_col="g").collect()}
    # group-local bins: the smallest of group b is bin 0 despite being
    # larger than everything in group a
    assert out[100] == 0 and out[9] == 4
    assert out[999] is None
    assert quantile_discretize(df, "v", 5, group_col="g").count() == 21


def test_discretize_rejects_single_bin(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="nbins"):
        quantile_discretize(df, "v", 1)
