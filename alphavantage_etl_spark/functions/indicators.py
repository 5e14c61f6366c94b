"""Technical-indicator window functions: Bollinger bands, Cutler's RSI,
rolling volatility, running drawdown.

The reference computes one indicator family (trailing SMA trend lines,
data_viz.py:100-109); any user of a financial ETL engine reaches for
these next, and they are pure window expressions — no UDFs, no state.

Cross-engine determinism (the driver hash-compares against DuckDB) is the
design constraint, and windowed FLOAT aggregation breaks it: Spark's
sliding aggregate and DuckDB's segment tree fold doubles in different
orders. Every indicator here therefore aggregates EXACT integers
(prices as cents, returns as half-even-rounded 1e-9 units) in
decimal(38,0) — overflow-proof, order-independent — and converts to
double ONCE at the end: the exact-integer-to-double conversion and the
closing arithmetic (+, -, *, /, sqrt) are IEEE-determined, so both
engines produce bit-identical results. Same pattern as
``windows.sma_exact_cents`` and ``similarity.label_centroids``.

Single-series frames are a deliberate single-reducer sort (the
reference's shape: one row per date); every function takes
``partition_by`` to shard by symbol at scale, exactly like
``windows.sma``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def _base(order_col, partition_by) -> WindowSpec:
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    )
    return w.orderBy(order_col)


def _w(order_col, partition_by, lo, hi) -> WindowSpec:
    return _base(order_col, partition_by).rowsBetween(lo, hi)


def _cents(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def _dec(col: Column) -> Column:
    return col.cast("decimal(38,0)")


def _var_from_sums(s1: Column, s2: Column, k: int) -> Column:
    """Sample variance from exact integer sums, arithmetic in doubles:
    (s2 - s1^2/k) / (k-1). s1/s2 arrive as exact decimals; the double
    conversion is the single rounding point and is IEEE-identical across
    engines."""
    s1d, s2d = s1.cast("double"), s2.cast("double")
    return (s2d - s1d * s1d / F.lit(float(k))) / F.lit(float(k - 1))


def bollinger_bands(
    value_col: Column | str,
    k: int = 20,
    num_std: float = 2.0,
    order_col: str = "date",
    partition_by: list[str] | None = None,
) -> tuple[Column, Column, Column]:
    """(middle, upper, lower) over the k-row INCLUSIVE trailing frame
    (the conventional Bollinger frame; the reference's SMA trend uses the
    exclusive frame and keeps its own convention). NULL until k rows."""
    w = _w(order_col, partition_by, -(k - 1), 0)
    cents = _cents(value_col)
    full = F.count(cents).over(w) == k
    s1 = F.sum(_dec(cents)).over(w)
    s2 = F.sum(_dec(cents) * _dec(cents)).over(w)
    mid = F.when(full, s1.cast("double") / F.lit(100.0 * k))
    sd = F.when(full, F.sqrt(_var_from_sums(s1, s2, k)) / F.lit(100.0))
    return (
        mid,
        mid + F.lit(float(num_std)) * sd,
        mid - F.lit(float(num_std)) * sd,
    )


def rsi_cutler(
    value_col: Column | str,
    k: int = 14,
    order_col: str = "date",
    partition_by: list[str] | None = None,
) -> Column:
    """Cutler's RSI (SMA form — the window-expressible variant; Wilder's
    original is a recursive EMA): 100 - 100/(1 + avg gain / avg loss)
    over the last k price changes. All-gain windows read 100, all-flat 50;
    NULL until k changes exist. Change sums are exact integer cents."""
    cents = _cents(value_col)
    d = cents - F.lag(cents, 1).over(_base(order_col, partition_by))
    w = _w(order_col, partition_by, -(k - 1), 0)
    full = F.count(d).over(w) == k
    sg = F.sum(_dec(F.greatest(d, F.lit(0)))).over(w).cast("double")
    sl = F.sum(_dec(F.greatest(-d, F.lit(0)))).over(w).cast("double")
    return F.when(
        full,
        F.when((sl == 0) & (sg == 0), F.lit(50.0))
        .when(sl == 0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + sg / sl)),
    )


def rolling_volatility(
    value_col: Column | str,
    k: int = 20,
    order_col: str = "date",
    partition_by: list[str] | None = None,
) -> Column:
    """Sample standard deviation of SIMPLE returns over the last k
    returns. Each return (cents_t / cents_{t-1} - 1) is an exact-rational
    double, half-even-rounded to 1e-9 units and summed as exact integers —
    float fold order can never flip the hash. NULL until k returns."""
    cents = _cents(value_col)
    prev = F.lag(cents, 1).over(_base(order_col, partition_by))
    r = F.when(prev > 0, cents.cast("double") / prev.cast("double") - 1.0)
    ri = F.bround(r * 1e9).cast("long")
    w = _w(order_col, partition_by, -(k - 1), 0)
    full = F.count(ri).over(w) == k
    s1 = F.sum(_dec(ri)).over(w)
    s2 = F.sum(_dec(ri) * _dec(ri)).over(w)
    return F.when(full, F.sqrt(_var_from_sums(s1, s2, k)) / F.lit(1e9))


def drawdown(
    value_col: Column | str,
    order_col: str = "date",
    partition_by: list[str] | None = None,
) -> Column:
    """Running drawdown: value / running-max - 1 (<= 0; 0 at new highs).
    The running max is over exact cents; the division is one exact-integer
    ratio in doubles — deterministic."""
    w = _w(order_col, partition_by, Window.unboundedPreceding, 0)
    cents = _cents(value_col)
    peak = F.max(cents).over(w)
    return F.when(
        peak > 0, cents.cast("double") / peak.cast("double") - 1.0
    ).otherwise(F.lit(0.0))
