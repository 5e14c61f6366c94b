"""Calendar resampling with forward fill — densify a sparse per-key daily
series onto a gap-free calendar, carrying the last observation forward.

Reference scope: the reference's series arrive dense from the API and it
guards AGAINST stale days with the busday gap check (av_etl.py:149-151);
the warehouse-side complement is producing an explicitly dense series —
join-ready against any other daily table — with provenance (`is_filled`)
for every carried-forward row. Classic pandas ``resample('D').ffill()``,
re-expressed distributively.

Scale design (100 TB): one aggregation computes each key's [min, max]
date span (map-side partial); the calendar explodes from the span row —
O(days) rows per key generated IN-PLAN, no driver loop, no calendar
table shipped. The left join back to the observations and the
forward-fill window (`last(ignorenulls)` over rows-unbounded-preceding)
both partition on the key, so AQE coalesces them onto one Exchange
chain; per-key state in the window is one row. Keys are independent —
the operator scales with key count, and a single pathological key costs
its own span length only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Densify (key, date) observations to every calendar day in each
    key's observed span, forward-filling ``value_cols`` and flagging
    carried rows with ``is_filled``. The first row of every key is an
    observation by construction (the span starts at an observed date),
    so no leading NULLs survive.
    """
    span = df.groupBy(key_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    cal = span.select(
        key_col,
        F.explode(F.sequence("__d0", "__d1")).alias(date_col),
    )
    # explicit observation marker: is_filled must mean "calendar-
    # generated row", not "first value column was NULL" — an observed row
    # whose first value happens to be NULL is still an observation
    obs = df.withColumn("__obs", F.lit(True))
    j = cal.join(obs, on=[key_col, date_col], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key_col,
        date_col,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        F.col("__obs").isNull().alias("is_filled"),
    )
