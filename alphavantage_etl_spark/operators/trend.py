"""Per-group linear trend (OLS slope/intercept) in one aggregation.

Reference scope: the reference renders its series for visual trend
reading (data_viz.py figures); the warehouse-side primitive is the OLS
line per series — "is this symbol drifting, and how fast" — computed for
every group in one pass.

Scale design (100 TB): the closed-form simple-regression solution needs
only the five sufficient statistics (n, Σx, Σy, Σxy, Σx²), which are
PARTIAL-AGGREGATABLE — one hash aggregation per key, map-side combine,
no window, no sort, no iteration. Exactness discipline: x and y are
quantized to integer units first (x as day offsets, y as value ticks),
the five sums accumulate exactly in decimal(38,0) (bigint products can
overflow long at corpus scale), and the slope/intercept emerge from ONE
fixed-order double expression each over exact integers — bit-identical
across engines and partial-merge orders (the sma_exact_cents discipline
applied to regression).

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    y_scale: int = 100,
    round_to: int = 9,
) -> DataFrame:
    """(group, n, slope, intercept) per group; ``x_col`` must be integer-
    valued (e.g. a day offset), ``y_col`` is quantized at ``y_scale``
    ticks. Groups with fewer than 2 points or zero x-variance return NULL
    slope/intercept (a vertical or single-point fit has no OLS line).
    Slope/intercept are in ORIGINAL y units per x unit, half-even-rounded
    to ``round_to`` decimals.
    """
    x = F.col(x_col).cast("decimal(38,0)")
    yq = F.round(F.col(y_col) * y_scale).cast("decimal(38,0)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(yq).alias("__sy"),
        F.sum(x * yq).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("__n", "__sx", "__sy", "__sxy", "__sxx"))
    det = n * sxx - sx * sx
    slope_ticks = F.when(
        det != 0,
        (n * sxy - sx * sy).cast("double") / det.cast("double"),
    )
    intercept_ticks = F.when(
        det != 0,
        (sy.cast("double") - slope_ticks * sx.cast("double"))
        / n.cast("double"),
    )
    return agg.select(
        group_col,
        n.cast("long").alias("n"),
        F.bround(slope_ticks / y_scale, round_to).alias("slope"),
        F.bround(intercept_ticks / y_scale, round_to).alias("intercept"),
    )
