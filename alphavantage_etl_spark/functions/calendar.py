"""Business-day calendar — the one reference semantic with no Spark builtin.

The reference calls ``np.busday_count(begin, end, holidays=NYSE)``
(av_etl.py:50-51, 148-149) and the plain Mon-Fri variant (av_etl.py:95, 151).
Verified semantics (SURVEY.md section 2.8 D1): counts weekdays in the
**half-open interval [begin, end)**, minus holidays.

Spark-first design: build a **calendar dimension** with ``sequence()`` +
``explode`` and count via joins — never a Python UDF. At 100 TB the calendar
is a few thousand rows per century: broadcast-joinable everywhere, computed
once per session. This is library code, not planner code (SURVEY.md 4.1).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def business_day_calendar(
    spark: SparkSession,
    start: str | date,
    end: str | date,
    holidays: list[str] | None = None,
) -> DataFrame:
    """One row per business day (Mon-Fri minus holidays) in [start, end].

    Columns: ``d`` (date). Weekday test uses ``F.weekday`` (Mon=0..Sun=6 —
    same convention as Python's ``date.weekday()`` used at av_etl.py:123).
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
        ).alias("d")
    )
    bd = days.where(F.weekday("d") < 5)
    if holidays:
        from .vectors import inline_rows_df

        hol = inline_rows_df(
            spark, [(h,) for h in holidays], [("d", "STRING")]
        ).select(
            F.col("d").cast("date").alias("d")
        )
        # left_anti against a tiny holiday table -> broadcast, no shuffle
        bd = bd.join(F.broadcast(hol), "d", "left_anti")
    return bd


def busday_count_expr(cal: DataFrame, begin: Column, end: Column) -> Column:
    """Scalar-subquery-free busday count: join pattern.

    For row-wise counts, join the fact table to ``cal`` on
    ``cal.d >= begin AND cal.d < end`` (half-open, np.busday_count parity)
    and count. Exposed as a helper for plans that need a literal column
    instead: count distinct business days via aggregation on the calendar.
    """
    return F.count(F.when((F.col("d") >= begin) & (F.col("d") < end), 1))
