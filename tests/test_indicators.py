"""Indicator semantics on literal frames — known-value pins independent of
the DuckDB oracle (which vouches for cross-engine agreement, not for the
finance math being right)."""

from __future__ import annotations

import math
from datetime import date

from pyspark.sql import functions as F

from alphavantage_etl_spark.functions.indicators import (
    bollinger_bands,
    drawdown,
    rolling_volatility,
    rsi_cutler,
)


def _series(spark, vals):
    rows = [(date(2024, 1, i + 1), float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "date date, close double")


def test_bollinger_known_values(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0]
    df = _series(spark, vals)
    mid, up, lo = bollinger_bands("close", k=3, num_std=2.0)
    out = df.select("date", mid.alias("m"), up.alias("u"), lo.alias("l")).collect()
    # rows 0-1: under k -> NULL
    assert out[0]["m"] is None and out[1]["u"] is None
    # row 2: mean(10,11,12)=11, sample sd=1
    assert out[2]["m"] == 11.0
    assert out[2]["u"] == 13.0 and out[2]["l"] == 9.0


def test_rsi_known_values(spark):
    # strictly rising -> all-gain window -> RSI 100; flat -> 50
    up = _series(spark, [1, 2, 3, 4, 5])
    r = up.select(rsi_cutler("close", k=3).alias("r")).collect()
    assert r[0]["r"] is None and r[2]["r"] is None  # only 2 changes yet
    assert r[3]["r"] == 100.0 and r[4]["r"] == 100.0
    flat = _series(spark, [5, 5, 5, 5, 5])
    rf = flat.select(rsi_cutler("close", k=3).alias("r")).collect()
    assert rf[4]["r"] == 50.0
    # mixed: changes +1,+1,-1 over k=3 -> 100 - 100/(1 + 2/1)
    mix = _series(spark, [10, 11, 12, 11])
    rm = mix.select(rsi_cutler("close", k=3).alias("r")).collect()
    assert abs(rm[3]["r"] - (100 - 100 / 3)) < 1e-9


def test_volatility_and_drawdown_known_values(spark):
    vals = [100.0, 110.0, 99.0, 108.9]
    df = _series(spark, vals)
    out = df.select(
        rolling_volatility("close", k=3).alias("v"), drawdown("close").alias("d")
    ).collect()
    # returns: +0.1, -0.1, +0.1 -> sample sd of (.1,-.1,.1)
    rets = [0.1, -0.1, 0.1]
    mean = sum(rets) / 3
    want = math.sqrt(sum((r - mean) ** 2 for r in rets) / 2)
    assert out[2]["v"] is None and abs(out[3]["v"] - want) < 1e-6
    # drawdown: peak 110 -> 99/110-1, then 108.9/110-1
    assert out[0]["d"] == 0.0 and out[1]["d"] == 0.0
    assert abs(out[2]["d"] - (99 / 110 - 1)) < 1e-9
    assert abs(out[3]["d"] - (108.9 / 110 - 1)) < 1e-9


def test_partitioned_indicators_match_per_series(spark):
    """partition_by shards the window: each symbol's values must equal the
    single-series computation on that symbol alone."""
    rows = [
        ("A", date(2024, 1, i + 1), float(v))
        for i, v in enumerate([10, 11, 12, 13, 14])
    ] + [
        ("B", date(2024, 1, i + 1), float(v))
        for i, v in enumerate([50, 40, 45, 44, 46])
    ]
    df = spark.createDataFrame(rows, "sym string, date date, close double")
    mid, _u, _l = bollinger_bands("close", k=3, partition_by=["sym"])
    got = {
        (r["sym"], r["date"]): r["m"]
        for r in df.select("sym", "date", mid.alias("m")).collect()
    }
    for sym in ("A", "B"):
        solo = df.where(F.col("sym") == sym)
        m2, _, _ = bollinger_bands("close", k=3)
        want = {
            (sym, r["date"]): r["m"]
            for r in solo.select("date", m2.alias("m")).collect()
        }
        for key, v in want.items():
            assert got[key] == v


def test_ema_matches_pandas_recursion(spark):
    import pandas as pd

    from alphavantage_etl_spark.functions.indicators import ema

    vals = [100.0, 102.0, 101.0, 105.0, 104.0, 103.0, 108.0]
    df = _series(spark, vals)
    got = {
        r["date"]: r["ema"]
        for r in ema(df, "close", span=3).collect()
    }
    want = pd.Series(vals).ewm(span=3, adjust=False).mean().tolist()
    for i, w in enumerate(want):
        assert abs(got[date(2024, 1, i + 1)] - w) < 1e-12
    # partitioned: each key folds independently
    two = spark.createDataFrame(
        [("A", date(2024, 1, i + 1), v) for i, v in enumerate(vals)]
        + [("B", date(2024, 1, i + 1), v * 2) for i, v in enumerate(vals)],
        "sym string, date date, close double",
    )
    out = ema(two, "close", span=3, partition_by=["sym"]).collect()
    for r in out:
        scale = 1.0 if r["sym"] == "A" else 2.0
        assert abs(r["ema"] - want[r["date"].day - 1] * scale) < 1e-9


def test_rsi_wilder_seed_and_recursion(spark):
    from alphavantage_etl_spark.functions.indicators import rsi_wilder

    # +1 x3 then -1: seed avg gain 1 (k=3), then Wilder smoothing
    vals = [10.0, 11.0, 12.0, 13.0, 12.0]
    out = {
        r["date"].day: r["rsi"]
        for r in rsi_wilder(_series(spark, vals), "close", k=3).collect()
    }
    assert out[1] is None and out[3] is None  # first k rows are NULL
    assert out[4] == 100.0  # all-gain seed window
    # next step: ag=(1*2+0)/3, al=(0*2+1)/3 -> rsi = 100 - 100/(1+2)
    assert abs(out[5] - (100 - 100 / 3)) < 1e-9


def test_rolling_corr_known_values(spark):
    from alphavantage_etl_spark.functions.indicators import rolling_corr

    rows = [
        (date(2024, 1, i + 1), float(x), float(y))
        for i, (x, y) in enumerate(
            [(1, 2), (2, 4), (3, 6), (4, 7), (5, 5), (6, 4)]
        )
    ]
    df = spark.createDataFrame(rows, "date date, x double, y double")
    out = [
        r["c"]
        for r in df.select(rolling_corr("x", "y", k=3).alias("c")).collect()
    ]
    assert out[0] is None and out[1] is None  # under k
    assert abs(out[2] - 1.0) < 1e-12  # (1,2,3) vs (2,4,6): perfect
    import numpy as np

    want = np.corrcoef([4, 5, 6], [7, 5, 4])[0, 1]
    assert abs(out[5] - want) < 1e-9
    # constant y in frame -> zero variance -> NULL
    flat = spark.createDataFrame(
        [(date(2024, 1, i + 1), float(i), 5.0) for i in range(4)],
        "date date, x double, y double",
    )
    fc = [
        r["c"]
        for r in flat.select(rolling_corr("x", "y", k=3).alias("c")).collect()
    ]
    assert fc[2] is None and fc[3] is None


def test_partitioned_indicator_suite_single_window_exchange(spark):
    """Scale-form plan evidence for the whole r3 indicator suite (the SMA
    evidence already exists): Bollinger, Cutler RSI, volatility, drawdown,
    and rolling correlation computed together over the SAME
    (partition_by, order) spec must share ONE hash-partition Exchange —
    per-symbol sharding, no single-reducer sort, no per-indicator
    re-shuffle."""
    from alphavantage_etl_spark.functions.indicators import (
        bollinger_bands,
        drawdown,
        rolling_corr,
        rolling_volatility,
        rsi_cutler,
    )

    rows = [
        (sym, date(2024, 1, i + 1), 100.0 + i + ord(sym[0]), 1.0 + 0.01 * i)
        for sym in ("A", "B", "C")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "sym string, date date, close double, fx double")
    p = ["sym"]
    mid, up, lo = bollinger_bands("close", k=20, partition_by=p)
    out = df.select(
        "sym", "date",
        mid.alias("bb_mid"), up.alias("bb_up"), lo.alias("bb_lo"),
        rsi_cutler("close", k=14, partition_by=p).alias("rsi"),
        rolling_volatility("close", k=20, partition_by=p).alias("vol"),
        drawdown("close", partition_by=p).alias("dd"),
        rolling_corr("close", "fx", 20, partition_by=p).alias("corr"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert out.count() == 90


# --------------------------------------------------------------------- ACF
def test_acf_periodic_series_known_values(spark):
    from alphavantage_etl_spark.functions.indicators import acf

    # strict period-2 alternation: acf(even lags) = +1, acf(odd) = -1
    rows = [("s", i, 10.0 if i % 2 == 0 else 20.0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["lag"]: r for r in acf(df, "k", "t", "v", max_lag=4).collect()}
    assert abs(out[2]["acf"] - 1.0) < 1e-6 and abs(out[4]["acf"] - 1.0) < 1e-6
    assert out[1]["acf"] < -0.99 and out[3]["acf"] < -0.99
    assert out[1]["n"] == 39 and out[4]["n"] == 36


def test_acf_constant_series_null_and_key_isolated(spark):
    from alphavantage_etl_spark.functions.indicators import acf

    rows = [("flat", i, 5.0) for i in range(10)] + [
        ("trend", i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {(r["k"], r["lag"]): r for r in acf(df, "k", "t", "v", max_lag=2).collect()}
    assert out[("flat", 1)]["acf"] is None  # zero variance
    assert out[("trend", 1)]["acf"] > 0.9   # strong positive memory
    # keys never mix: flat's rows cannot dilute trend's pairs
    assert out[("trend", 1)]["n"] == 9


def test_acf_single_window_exchange(spark):
    from alphavantage_etl_spark.functions.indicators import acf

    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(50)], "k string, t long, v double"
    )
    plan = acf(df, "k", "t", "v", max_lag=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # all five lag columns ride ONE partitionBy(k) window Exchange; the
    # only other Exchange is the (k, lag) aggregation
    assert plan.count("Window") == 1
