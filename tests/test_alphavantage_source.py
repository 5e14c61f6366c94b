"""Wire-format parse tests for the Alpha Vantage source (IO1/IO2/R1):
the exact reference payload shape — map-of-maps keyed newest-first, all
leaf values strings — must come out as a typed, ascending, complete frame.
"""

from __future__ import annotations

import datetime as dt

import pytest

from alphavantage_etl_spark.sources.alphavantage import (
    fetch_payload,
    payload_to_df,
)

EQUITY_PAYLOAD = {
    "Meta Data": {"2. Symbol": "SPY"},
    "Time Series (Daily)": {
        # newest-first, as the API returns it (av_etl.py:76 reverses)
        "2024-01-03": {
            "1. open": "470.10", "2. high": "472.00", "3. low": "469.50",
            "4. close": "471.25", "5. volume": "81234567",
        },
        "2024-01-02": {
            "1. open": "468.00", "2. high": "470.90", "3. low": "467.10",
            "4. close": "470.00", "5. volume": "75000000",
        },
    },
}

FX_PAYLOAD = {
    "Time Series FX (Daily)": {
        "2024-01-02": {
            "1. open": "3.9400", "2. high": "3.9700",
            "3. low": "3.9300", "4. close": "3.9550",
        },
    },
}


def test_equity_payload_parses_typed_ascending(spark):
    df = payload_to_df(spark, EQUITY_PAYLOAD, "TIME_SERIES_DAILY")
    assert df.columns == ["date", "open", "high", "low", "close", "volume"]
    assert dict(df.dtypes) == {
        "date": "date", "open": "double", "high": "double",
        "low": "double", "close": "double", "volume": "bigint",
    }
    rows = df.collect()
    assert [r["date"] for r in rows] == [dt.date(2024, 1, 2), dt.date(2024, 1, 3)]
    assert rows[1]["close"] == 471.25
    assert rows[0]["volume"] == 75000000


def test_fx_payload_has_no_volume(spark):
    df = payload_to_df(spark, FX_PAYLOAD, "FX_DAILY")
    assert df.columns == ["date", "open", "high", "low", "close"]
    assert df.first()["close"] == 3.9550


def test_empty_payload_yields_empty_frame(spark):
    df = payload_to_df(spark, {"Time Series (Daily)": {}}, "TIME_SERIES_DAILY")
    assert df.count() == 0
    assert df.columns == ["date", "open", "high", "low", "close", "volume"]


def test_fetch_is_gated_without_requests(spark):
    try:
        import requests  # noqa: F401

        pytest.skip("requests available; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="alphavantage.co"):
        fetch_payload({"function": "TIME_SERIES_DAILY", "symbol": "SPY"})


# --- IO3/IO5: JDBC configuration surface (no DB in container — the reader/
# writer must be fully configured without connecting) ---
def test_jdbc_reader_config(spark):
    from alphavantage_etl_spark.sources.jdbc import jdbc_append, jdbc_reader

    r = jdbc_reader(
        spark, "jdbc:postgresql://db/av", table="src_px_usd",
        partition_column="date", lower_bound="2000-01-01",
        upper_bound="2025-01-01", num_partitions=16,
    )
    assert r is not None  # configured lazily; .load() would connect

    with pytest.raises(ValueError, match="exactly one"):
        jdbc_reader(spark, "jdbc:x://y", table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_reader(spark, "jdbc:x://y")
    with pytest.raises(ValueError, match="together"):
        jdbc_reader(spark, "jdbc:x://y", table="t", partition_column="date")

    df = spark.range(3).withColumnRenamed("id", "date")
    w = jdbc_append(df, "jdbc:postgresql://db/av", "src_px_usd")
    assert w is not None
