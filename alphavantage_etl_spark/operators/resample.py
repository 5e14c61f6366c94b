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


def seasonal_profile(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """(group, isodow, n, dow_mean, seasonal_index): the day-of-week
    seasonality profile per group — index = day-mean / group-mean, the
    multiplicative weekly component a forecaster divides out (and the
    sanity check that "weekend dips" in a metric are seasonality, not
    incidents: an anomaly detector that ignores a 0.7 Sunday index
    pages every Sunday).

    ``isodow`` (1 = Monday .. 7 = Sunday) is computed as
    ``pmod(days_since_epoch + 3, 7) + 1`` — pure integer arithmetic on
    the epoch day, identical on every engine, instead of the engines'
    mutually-incompatible dayofweek() conventions (Spark 1=Sunday,
    DuckDB 0=Sunday). pmod (not %) because both engines' % keep the
    dividend's sign: a plain modulo would label pre-1970 timestamps
    with isodow <= 0 (r5 ADVICE).

    Exactness: values quantize to integer cents before summation (exact
    decimal sums, merge-order-immune); both means and the index are
    fixed-order double expressions over those integers, shipped
    unrounded (pure rational — the target_encode rule).

    Scale: ONE corpus scan into the |groups| x 7 grid (map-side
    partial); the group totals derive from the grid.
    """
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    epoch_day = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01"))
    isodow = (F.pmod(epoch_day + 3, F.lit(7)) + 1).cast("long")
    grid = (
        events.select(
            F.col(group_col).alias("g"),
            isodow.alias("isodow"),
            cents.alias("__c"),
        )
        .where(F.col("__c").isNotNull())
        .groupBy("g", "isodow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__c").cast("decimal(38,0)")).alias("__s"),
        )
    )
    tot = grid.groupBy("g").agg(
        F.sum("n").alias("__tn"), F.sum("__s").alias("__ts")
    )
    dow_mean = F.col("__s").cast("double") / F.col("n").cast("double") / 100.0
    g_mean = F.col("__ts").cast("double") / F.col("__tn").cast("double") / 100.0
    return (
        grid.join(tot, "g")
        .select(
            F.col("g").alias(group_col),
            "isodow",
            "n",
            dow_mean.alias("dow_mean"),
            F.when(g_mean != 0, dow_mean / g_mean).alias("seasonal_index"),
        )
    )

def percentile_bands(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    probs: tuple = (0.1, 0.5, 0.9),
) -> DataFrame:
    """(group, week_start, n, p10, p50, p90): the weekly percentile-band
    trend per group — the metric-drift view an SLO/latency review reads
    (the median tells you the typical; the band tells you whether the
    TAIL is what moved). Weeks start Monday, labeled by epoch-day
    arithmetic (pmod, engine-portable — the seasonal_profile isodow
    discipline, pre-1970-safe).

    Percentiles are exact interpolated values rounded half-even to 1e-6
    (the winsorize/percentiles convention — oracle-pinned elsewhere in
    the repo). NULL values are excluded.

    Scale: one hash aggregation into the (group x week) grid; exact
    percentiles aggregate per grid cell (Spark's percentile is a
    partial-aggregatable TypedImperativeAggregate — map-side combine,
    no window, no sort).
    """
    epoch_day = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01"))
    week_start = F.date_add(
        F.lit("1970-01-01").cast("date"),
        (epoch_day - F.pmod(epoch_day + 3, F.lit(7))).cast("int"),
    )
    v = F.col(value_col).cast("double")
    cols = [
        F.bround(F.expr(f"percentile(v, {p})"), 6).alias(
            f"p{int(p * 100)}"
        )
        for p in probs
    ]
    return (
        events.select(
            F.col(group_col).alias("g"),
            week_start.alias("week_start"),
            v.alias("v"),
        )
        .where(F.col("v").isNotNull())
        .groupBy("g", "week_start")
        .agg(F.count(F.lit(1)).alias("n"), *cols)
        .withColumnRenamed("g", group_col)
    )
