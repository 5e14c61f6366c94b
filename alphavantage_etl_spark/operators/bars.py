"""OHLCV bar aggregation (SURVEY.md section 2.7 A1).

The reference consumes daily OHLCV bars pre-aggregated by the Alpha Vantage
API (data_viz.py:43-56 draws them directly); this operator is the generating
aggregation — bars from raw ticks/events — needed for capability parity once
the data source is raw rows instead of a bar API.

Spark-first: a single ``groupBy(day)`` with ``min_by``/``max_by`` ordered
first/last — one shuffle, map-side partial aggregation, no window pass and
no second shuffle. The tie-break column makes first/last deterministic when
timestamps collide (the fixtures' ``orders`` rows all land at midnight).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ohlcv_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    date_alias: str = "date",
) -> DataFrame:
    """Daily bars: open/high/low/close/volume of ``value_col`` per calendar day.

    open  = value at min (ts, *tiebreak)        (ordered-first)
    close = value at max (ts, *tiebreak)        (ordered-last)
    high/low = max/min value; volume = row count.

    Scale: at 100 TB this is the canonical partial-agg shuffle — each of the
    five aggregates combines map-side, so shuffle volume is one row per
    (day, mapper), not per event. For a multi-symbol table add the symbol to
    the groupBy; nothing else changes.
    """
    order_key: Column = F.struct(
        F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]
    )
    day = F.to_date(F.col(ts_col)).alias(date_alias)
    v = F.col(value_col)
    return df.groupBy(day).agg(
        F.min_by(v, order_key).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, order_key).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )
