"""Rolling-window analytics with the reference's exact semantics.

The reference computes ``df[c].rolling(k).mean().shift(-k)`` on a date-DESC
frame (data_viz.py:100-109) with k in {20, 90} (constants.py:17). Verified
semantics (SURVEY.md section 2.6 W1): in ASC date order,

    SMA_k(row i) = mean(value over rows i-k .. i-1)   -- EXCLUSIVE of row i
    NULL when fewer than k rows strictly precede row i

pandas' ``rolling`` default ``min_periods=k`` yields the NULL; Spark's
``avg`` over a short frame silently yields a partial mean instead, so the
``when(count == k)`` guard here is load-bearing — without it the first k-1
rows diverge from the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _frame(order_col: str | Column, k: int, partition_by: list[str] | None) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(order_col).rowsBetween(-k, -1)


def sma(col: Column | str, k: int, order_col: str | Column = "date",
        partition_by: list[str] | None = None) -> Column:
    """Simple moving average over the k rows strictly before the current one.

    NULL until k rows precede (reference parity, data_viz.py:100-109).

    Scale note: an unpartitioned window is a single-reducer sort — fine for
    one instrument's daily series (the reference's case: one row per date),
    wrong for a 100 TB multi-series table. Pass ``partition_by`` (e.g. the
    symbol column) to keep the window parallel; the per-key frame semantics
    are unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = _frame(order_col, k, partition_by)
    return F.when(F.count(c).over(w) == k, F.avg(c).over(w))


def sma_exact_cents(col: Column | str, k: int, order_col: str | Column = "date",
                    partition_by: list[str] | None = None) -> Column:
    """SMA over 2-decimal money values with order-independent exactness.

    Sums ``round(x*100)`` as integers inside the frame (exact — no FP
    accumulation order sensitivity), then performs ONE double division.
    Engines that disagree on windowed-avg summation order (Spark sliding
    aggregate vs DuckDB segment tree) still produce bit-identical results,
    which the driver's value-hash comparison requires.
    """
    c = F.col(col) if isinstance(col, str) else col
    cents = F.round(c * 100).cast("long")
    w = _frame(order_col, k, partition_by)
    total = F.sum(cents).over(w)
    return F.when(F.count(cents).over(w) == k, total / F.lit(100.0 * k))
