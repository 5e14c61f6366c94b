"""Calendar resample + forward-fill semantics on crafted frames."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.resample import resample_ffill


def _d(day):
    return dt.date(2024, 1, day)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k string, date date, v long")


def test_gaps_filled_with_last_observation(spark):
    rows = [("a", _d(1), 10), ("a", _d(4), 40), ("a", _d(6), 60)]
    out = sorted(
        resample_ffill(_frame(spark, rows), "k", "date", ["v"]).collect(),
        key=lambda r: r["date"],
    )
    assert [(r["date"].day, r["v"], r["is_filled"]) for r in out] == [
        (1, 10, False), (2, 10, True), (3, 10, True),
        (4, 40, False), (5, 40, True), (6, 60, False),
    ]


def test_keys_resample_independently(spark):
    rows = [("a", _d(1), 1), ("a", _d(3), 3), ("b", _d(10), 7)]
    out = resample_ffill(_frame(spark, rows), "k", "date", ["v"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # a spans 3 days; b's single observation spans 1 day (no spill from a)
    assert len(by_key["a"]) == 3 and len(by_key["b"]) == 1
    assert by_key["b"][0]["is_filled"] is False


def test_multiple_value_columns_fill_together(spark):
    df = spark.createDataFrame(
        [("a", _d(1), 1, 10.0), ("a", _d(3), 3, 30.0)],
        "k string, date date, v long, w double",
    )
    out = sorted(
        resample_ffill(df, "k", "date", ["v", "w"]).collect(),
        key=lambda r: r["date"],
    )
    assert (out[1]["v"], out[1]["w"], out[1]["is_filled"]) == (1, 10.0, True)


def test_resample_plan_shares_key_partitioning(spark):
    df = _frame(spark, [("a", _d(1), 1), ("a", _d(5), 5)])
    plan = (
        resample_ffill(df, "k", "date", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # span agg, join, and window all partition on the key; no single-
    # partition window sneaks in
    assert "Exchange SinglePartition" not in plan, plan


def test_observed_row_with_null_first_value_is_not_marked_filled(spark):
    df = spark.createDataFrame(
        [("a", _d(1), 1, 10.0), ("a", _d(2), None, 20.0)],
        "k string, date date, v long, w double",
    )
    out = sorted(
        resample_ffill(df, "k", "date", ["v", "w"]).collect(),
        key=lambda r: r["date"],
    )
    # day 2 is a real observation (is_filled False); its NULL v is still
    # forward-filled per column (pandas ffill semantics), w observed
    assert out[1]["is_filled"] is False
    assert (out[1]["v"], out[1]["w"]) == (1, 20.0)


def test_seasonal_profile_known_index_and_isodow(spark):
    """Planted weekly pattern: Mondays average 2.0, every other day 1.0.
    isodow must be ISO (1=Monday; 2024-01-01 IS a Monday) and the index
    multiplicative around the group mean."""
    import datetime as dt

    from alphavantage_etl_spark.operators.resample import seasonal_profile

    rows = []
    for day in range(14):  # two full weeks starting Mon 2024-01-01
        d = dt.datetime(2024, 1, 1 + day, 12)
        v = 2.0 if day % 7 == 0 else 1.0
        rows.append(("a", d, v))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz, value double")
    out = {r["isodow"]: r for r in seasonal_profile(ev, "ts", "value", "event_type").collect()}
    assert set(out) == set(range(1, 8))
    assert out[1]["dow_mean"] == 2.0 and out[1]["n"] == 2  # Monday
    assert out[2]["dow_mean"] == 1.0
    g_mean = (2 * 2.0 + 12 * 1.0) / 14
    assert out[1]["seasonal_index"] == pytest.approx(2.0 / g_mean)
    assert out[7]["seasonal_index"] == pytest.approx(1.0 / g_mean)  # Sunday


def test_seasonal_profile_pre_1970_isodow_in_range(spark):
    """pmod, not %: both engines' % keep the dividend's sign, so
    pre-1970 timestamps (negative epoch days) must still label 1..7 —
    1969-12-28 was a Sunday (7), 1969-12-26 a Friday (5)."""
    from datetime import datetime

    from alphavantage_etl_spark.operators.resample import seasonal_profile

    ev = spark.createDataFrame(
        [
            (datetime(1969, 12, 28, 12, 0), 1.0, "a"),  # Sunday
            (datetime(1969, 12, 26, 9, 0), 2.0, "a"),  # Friday
            (datetime(1960, 2, 29, 0, 0), 3.0, "a"),  # leap-day Monday
        ],
        "ts timestamp, value double, event_type string",
    )
    rows = {
        r["isodow"]: r
        for r in seasonal_profile(ev, "ts", "value", "event_type").collect()
    }
    assert set(rows) == {7, 5, 1}
    assert all(1 <= d <= 7 for d in rows)
