"""Distribution tools: fixed-range histograms and per-group winsorization.

Reference scope: the reference eyeballs distributions via plotly charts
(data_viz.py); the warehouse-side primitives are the histogram (binned
counts a chart or a drift monitor reads directly) and winsorization
(clipping a metric to per-group quantile bounds before aggregation — the
standard robustness step ahead of means/regressions that outliers would
otherwise own).

Scale design (100 TB):
- ``histogram`` is one projection + one hash aggregation over at most
  ``nbins`` groups — partial aggregation collapses everything map-side;
  the bin arithmetic is two IEEE ops + a floor, identical across engines.
- ``winsorize_by_group`` computes per-group exact percentile bounds in
  one aggregation (|groups| rows), broadcast-joins them back (AQE), and
  clips in a projection. Bounds are half-even-rounded to 1e-6 BEFORE the
  comparison (the q_percentiles discipline) so an engine-ulp difference
  in the interpolated percentile cannot flip a value sitting exactly on
  the fence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """(bucket, bucket_lo, bucket_hi, n) for values in [lo, hi); values
    outside the range clamp into the edge buckets (closed histogram, no
    silent drops). NULL values surface as an explicit NULL-bucket row
    (with NULL edges) rather than polluting bucket 0 — greatest/least
    skip NULL operands, so the clamp alone would misfile them."""
    if not (hi > lo) or nbins < 1:
        raise ValueError("need hi > lo and nbins >= 1")
    v = F.col(value_col)
    raw = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(nbins))
    clamped = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), raw))
    bucket = F.when(v.isNotNull(), clamped).cast("long")
    width = (hi - lo) / nbins
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias(
                "bucket_hi"
            ),
            "n",
        )
    )


def winsorize_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.05,
) -> DataFrame:
    """Append ``<value>_wins``: the value clipped to its group's exact
    [p, 1-p] percentile bounds (interpolated percentiles, bounds rounded
    half-even to 1e-6 before comparison for cross-engine stability).
    NULL values stay NULL (least/greatest would otherwise fabricate the
    lower bound for them), and NULL group keys keep their rows — the
    bounds join is null-safe, matching the NULL group that groupBy
    produced."""
    if not 0 < p < 0.5:
        raise ValueError("p must be in (0, 0.5)")
    bounds = df.groupBy(group_col).agg(
        F.bround(F.expr(f"percentile({value_col}, {p})"), 6).alias("__lo"),
        F.bround(F.expr(f"percentile({value_col}, {1 - p})"), 6).alias("__hi"),
    ).withColumnRenamed(group_col, "__g")
    v = F.col(value_col)
    return (
        df.join(
            F.broadcast(bounds),
            on=F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .select(
            *df.columns,
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")),
            ).alias(f"{value_col}_wins"),
        )
    )
