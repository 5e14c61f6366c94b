"""Flagship end-to-end query (t1 smoke; SURVEY.md section 7.1 step 2).

The reference's core question — "price series in another currency, with
trend" (av_etl.py:142-195 + data_viz.py:100-109) — over the fixtures in one
plan: daily close from orders bars, as-of FX rate, half-even-rounded
conversion, SMA-20/SMA-90 with the reference's NULL-under-k window
semantics, ordered by date. Exercises IO3, P1, P3-P7, J1, S3, W1, A1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import money_round
from ..functions.windows import sma
from .views import fx_bars, px_bars

SMA_WINDOWS = (20, 90)  # constants.py:17


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = px_bars(spark, sf_dir).select("date", F.col("close").alias("close_usd"))
    fx = fx_bars(spark, sf_dir).select("date", F.col("close").alias("rate"))
    joined = (
        px.join(fx, "date", "inner")
        .withColumn("close_fx", money_round(F.col("close_usd") * (1 + F.col("rate")), 2))
    )
    out = joined.select(
        "date",
        "close_usd",
        "rate",
        "close_fx",
        *[
            sma("close_fx", k, order_col="date").alias(f"sma{k}")
            for k in SMA_WINDOWS
        ],
    )
    return out.orderBy("date")
