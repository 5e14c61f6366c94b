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


def _grouped_fold(df, fold, partition_by, out_col):
    """Run a per-group pandas fold with an appended double ``out_col``.
    Without ``partition_by`` the whole series is ONE group (a literal
    grouping column added first, dropped after) — the applyInPandas shape
    for recursion-over-prefix indicators."""
    keys = list(partition_by) if partition_by else ["__g"]
    src = df if partition_by else df.withColumn("__g", F.lit(1))
    # the fold's NaNs arrive as NULLs — out_col must be declared nullable
    # (a lit(0.0) withColumn would pin nullable=false and Arrow rejects).
    # Fresh StructType: StructType.add MUTATES, and src.schema is the
    # DataFrame's CACHED schema object — corrupting it breaks resolution.
    from pyspark.sql import types as T

    schema = T.StructType(
        list(src.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    out = src.groupBy(*keys).applyInPandas(fold, schema)
    return out if partition_by else out.drop("__g")


def ema(
    df,
    value_col: str,
    span: int,
    order_col: str = "date",
    partition_by: list[str] | None = None,
    out_col: str = "ema",
):
    """Exponential moving average (adjust=False recursion:
    ``ema_t = a*x_t + (1-a)*ema_{t-1}``, a = 2/(span+1)).

    The recursion makes every output depend on the ENTIRE prefix — not
    window-expressible (a window either bounds the frame or recomputes an
    unbounded fold per row), and the closed-form weighted sum overflows
    (1-a)^-t. This is the documented legitimate Pandas case: per-key
    sequential state, Arrow-batched via ``applyInPandas``, one group per
    series. Unpartitioned input runs as ONE group — same single-reducer
    caveat as the unpartitioned ``sma``; pass ``partition_by`` at scale.

    Returns ``df`` columns plus ``out_col``. Not DuckDB-oracle-backed
    (recursive; the engine-side recursion is pinned against pandas
    ``ewm(span, adjust=False)`` in tests instead).
    """
    def fold(pdf):
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(span=span, adjust=False).mean()
        )
        return pdf

    return _grouped_fold(df, fold, partition_by, out_col)


def rsi_wilder(
    df,
    value_col: str,
    k: int = 14,
    order_col: str = "date",
    partition_by: list[str] | None = None,
    out_col: str = "rsi",
):
    """Wilder's original RSI: smoothed averages via his recursion
    ``avg_t = (avg_{t-1}*(k-1) + x_t)/k`` seeded with the first k changes'
    simple mean — the recursive sibling of :func:`rsi_cutler` (which is
    the window-expressible SMA form). Same ``applyInPandas`` shape as
    :func:`ema`; NULL for the first k rows."""
    import numpy as np

    def fold(pdf):
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].astype("float64").to_numpy()
        n = len(x)
        rsi = np.full(n, np.nan)
        if n > k:
            d = np.diff(x)
            gains, losses = np.maximum(d, 0.0), np.maximum(-d, 0.0)
            ag, al = gains[:k].mean(), losses[:k].mean()
            for i in range(k, n):
                if i > k:
                    ag = (ag * (k - 1) + gains[i - 1]) / k
                    al = (al * (k - 1) + losses[i - 1]) / k
                if al == 0.0 and ag == 0.0:
                    rsi[i] = 50.0
                elif al == 0.0:
                    rsi[i] = 100.0
                else:
                    rsi[i] = 100.0 - 100.0 / (1.0 + ag / al)
        pdf[out_col] = rsi
        return pdf

    return _grouped_fold(df, fold, partition_by, out_col)


def rolling_corr(
    x_col: Column | str,
    y_col: Column | str,
    k: int = 20,
    order_col: str = "date",
    partition_by: list[str] | None = None,
) -> Column:
    """Pearson correlation of two price series over the trailing k rows,
    from exact integer-cents sums (Σx, Σy, Σx², Σy², Σxy in decimal(38,0))
    with one double conversion at the end — same cross-engine determinism
    argument as the other indicators. NULL until k paired rows, and NULL
    when either series is constant in the frame (zero variance)."""
    w = _w(order_col, partition_by, -(k - 1), 0)
    cx, cy = _cents(x_col), _cents(y_col)
    both = F.when(cx.isNotNull() & cy.isNotNull(), F.lit(1))
    n = F.sum(both).over(w)
    sx = F.sum(F.when(both.isNotNull(), _dec(cx))).over(w).cast("double")
    sy = F.sum(F.when(both.isNotNull(), _dec(cy))).over(w).cast("double")
    sxx = F.sum(F.when(both.isNotNull(), _dec(cx) * _dec(cx))).over(w).cast("double")
    syy = F.sum(F.when(both.isNotNull(), _dec(cy) * _dec(cy))).over(w).cast("double")
    sxy = F.sum(F.when(both.isNotNull(), _dec(cx) * _dec(cy))).over(w).cast("double")
    kf = F.lit(float(k))
    cov = sxy - sx * sy / kf
    vx = sxx - sx * sx / kf
    vy = syy - sy * sy / kf
    return F.when(
        (n == k) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )


def acf(
    df,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 5,
    ticks: int = 1,
):
    """(key, lag, n, acf) — per-series autocorrelation at lags 1..max_lag
    over the whole series (Pearson correlation of (x_t, x_{t-lag}) pairs),
    the seasonality/memory profile a forecasting or feature pipeline
    reads before choosing lags.

    Determinism (the rolling_corr discipline, aggregate form): values
    quantize to integer ``ticks`` units; all six sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) are exact decimal(38,0) sums over the
    paired rows; the correlation is ONE fixed-order double expression
    rounded half-even to 1e-9 (O(1) magnitude — safe grid); NULL when
    fewer than 2 pairs or either side is constant.

    Scale design (100 TB): ONE window Exchange per series key computes
    every lag column (a single partitionBy(key).orderBy(order) spec —
    Catalyst reuses the sort for all max_lag `lag()` calls); the stack
    explode is a Generate (max_lag rows per input row, bounded); the
    sums are one partial-aggregated groupBy on (key, lag) — bounded by
    |keys| * max_lag output rows.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    q = F.round(F.col(value_col).cast("double") * ticks).cast("long")
    cur = df.select(F.col(key_col), F.col(order_col), q.alias("__x"))
    lagged = cur.select(
        key_col,
        "__x",
        *[F.lag("__x", l).over(w).alias(f"__y{l}") for l in range(1, max_lag + 1)],
    )
    stacked = (
        lagged.select(
            key_col,
            "__x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(l).cast("long").alias("lag"),
                            F.col(f"__y{l}").alias("__y"),
                        )
                        for l in range(1, max_lag + 1)
                    ]
                )
            ).alias("__p"),
        )
        .select(
            key_col,
            F.col("__p.lag").alias("lag"),
            F.col("__x"),
            F.col("__p.__y").alias("__y"),
        )
        .where(F.col("__y").isNotNull())
    )
    dx = F.col("__x").cast("decimal(38,0)")
    dy = F.col("__y").cast("decimal(38,0)")
    g = stacked.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("__sx"),
        F.sum(dy).alias("__sy"),
        F.sum(dx * dx).alias("__sxx"),
        F.sum(dy * dy).alias("__syy"),
        F.sum(dx * dy).alias("__sxy"),
    )
    nf = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    cov = sxy - sx * sy / nf
    vx = sxx - sx * sx / nf
    vy = syy - sy * sy / nf
    return g.select(
        key_col,
        "lag",
        F.col("n").cast("long").alias("n"),
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            F.bround(cov / F.sqrt(vx * vy), 9),
        ).alias("acf"),
    )


def rolling_median(
    value: Column | str,
    order_col,
    k: int,
    partition_by: tuple = (),
) -> Column:
    """Exact rolling median of the trailing ``k`` rows (inclusive of the
    current row), NULL until a full window has accumulated — the robust
    complement of the SMA for spike-heavy series (one outlier moves a
    7-row mean by 1/7 of its magnitude but leaves the median untouched).

    Cross-engine exactness: the median runs over integer CENTS, so the
    even-count interpolation midpoint is an exact x.5 of integers —
    representable in a double with no rounding — and the single division
    back to currency units is one IEEE op over an identical input on
    both engines. A median over raw doubles would instead hit the
    engines' differing interpolation expressions ((a+b)/2 vs
    a+(b-a)/2) in their last bits.

    Implementation: Spark refuses ``median``/``percentile`` over a
    row frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame
    is collected into a k-BOUNDED sorted array and the median read by
    index — order-statistics over an array literal-sized by the window,
    pure codegen, no UDF. collect_list skips NULLs, matching the
    non-null count guard.

    Scale: one per-key window Exchange (same sort serves the count
    guard); never a global sort when ``partition_by`` is set; per-row
    state is the k-element array, independent of series length.
    """
    w = _w(order_col, partition_by, -(k - 1), 0)
    c = _cents(value)
    arr = F.sort_array(F.collect_list(c).over(w))
    n = F.size(arr)
    mid = F.floor((n + 1) / 2).cast("int")
    hi = F.floor(n / 2).cast("int") + 1
    med_cents = F.when(
        n % 2 == 1, F.element_at(arr, mid).cast("double")
    ).otherwise(
        (
            F.element_at(arr, mid).cast("double")
            + F.element_at(arr, hi).cast("double")
        )
        / F.lit(2.0)
    )
    return F.when(F.count(c).over(w) >= k, med_cents / F.lit(100.0))
