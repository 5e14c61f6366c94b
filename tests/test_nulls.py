"""Null-safety: the fixtures are null-free, so these literal frames pin how
each operator treats missing data (the reference's NaN path is dropna at
av_etl.py:191 — our operators must at least not crash or silently corrupt)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.functions.rounding import money_round
from alphavantage_etl_spark.functions.text import (
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from alphavantage_etl_spark.operators.asof import asof_join
from alphavantage_etl_spark.operators.bars import ohlcv_bars
from alphavantage_etl_spark.operators.dedup import dedup_exact
from alphavantage_etl_spark.operators.incremental import merge_incremental, new_rows


def d(s):
    return dt.date.fromisoformat(s)


def test_money_round_null_passthrough(spark):
    df = spark.createDataFrame([(None,), (1.005,)], "x double")
    got = [r["y"] for r in df.select(money_round("x", 2).alias("y")).collect()]
    assert got[0] is None and got[1] is not None


def test_text_functions_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "hello world")], "id long, t string")
    row = df.select(
        token_count("t").alias("n"),
        rolling_fingerprint("t").alias("h"),
        quality_score("t").alias("q"),
        lang_id("t").alias("l"),
    ).collect()[0]
    # null text -> null metrics, never an exception or a fake zero-score
    assert row["n"] is None and row["h"] is None
    assert row["q"] is None and row["l"] is None


def test_dedup_exact_null_key_groups_together(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, t string"
    )
    out = {r["t"]: r["id"] for r in dedup_exact(df, ["t"], "id").collect()}
    # groupBy treats NULL as one group (SQL GROUP BY semantics)
    assert out == {None: 1, "x": 3}


def test_new_rows_null_key(spark):
    incoming = spark.createDataFrame([(None, 1.0), (d("2024-01-02"), 2.0)], "date date, v double")
    existing = spark.createDataFrame([(None, 1.0)], "date date, v double")
    fresh = new_rows(incoming, existing, "date").collect()
    # left_anti uses null-UNsafe equality: a NULL key never matches, so the
    # null row survives as "new" — duplicate-null appends are possible.
    # Pinned here as documented behavior (sinks with nullable keys must
    # pre-filter; the reference's date PK could not be null either).
    assert {r["v"] for r in fresh} == {1.0, 2.0}
    merged = merge_incremental(incoming, existing, "date")
    assert merged.count() == 3


def test_ohlcv_bars_null_values(spark):
    rows = [
        (dt.datetime(2024, 1, 1), 1, None),
        (dt.datetime(2024, 1, 1), 2, 10.0),
        (dt.datetime(2024, 1, 1), 3, 5.0),
    ]
    df = spark.createDataFrame(rows, "t timestamp_ntz, k long, v double")
    bar = ohlcv_bars(df, "t", "v", tiebreak_cols=["k"]).collect()[0]
    # volume counts rows; min/max skip nulls (SQL aggregate semantics)
    assert bar["volume"] == 3
    assert bar["high"] == 10.0 and bar["low"] == 5.0


def test_asof_join_null_left_key(spark):
    left = spark.createDataFrame(
        [(None, 1.0), (d("2024-01-05"), 5.0)], "date date, px double"
    )
    right = spark.createDataFrame([(d("2024-01-03"), 30.0)], "date date, rate double")
    out = {r["px"]: r["rate"] for r in asof_join(left, right, "date").collect()}
    assert len(out) == 2, "null-key left rows must survive (left join semantics)"
    assert out[5.0] == 30.0
    assert out[1.0] is None
