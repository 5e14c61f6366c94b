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

from pyspark.sql import DataFrame, Window, functions as F


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


def _pair_grid(
    df: DataFrame, group_col: str, x_col: str, y_col: str, y_scale: int
):
    """(g, xi, yi, xj, yj) for every i<j pair WITHIN a group, over the
    per-(group, x) aggregated series — the shared input of the robust
    (rank/median-based) trend statistics. x must be integer-valued; y
    quantizes to ``y_scale`` ticks and duplicate x's collapse to their
    tick SUM first (one series point per x), so the pair count is
    C(|grid|, 2) per group — grid-bounded (the x spine is a calendar,
    not the data), never corpus-sized. Returns (pts, pairs) so callers
    count n_points from the SAME filtered grid the pairs come from
    (an x whose every y is NULL is not a series point — counting it
    would break the n_pairs == C(n_points, 2) invariant)."""
    pts = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(x_col).cast("long").alias("x"),
            F.round(F.col(y_col).cast("double") * y_scale)
            .cast("long")
            .alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("g", "x")
        .agg(F.sum("y").alias("y"))
    )
    a = pts.select(
        "g", F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = pts.select(
        "g", F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    return pts, a.join(b, "g").where(F.col("xi") < F.col("xj"))


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    y_scale: int = 100,
) -> DataFrame:
    """(group, n_points, n_pairs, sen_slope): the Theil-Sen slope per
    group — the MEDIAN of all pairwise slopes, the robust complement to
    :func:`group_trend`'s OLS line (a single spiked day can own an OLS
    slope; the median slope shrugs it off, which is what a metric-drift
    review wants).

    Exactness: each pairwise slope is ONE exact-integer double ratio
    ``(yj-yi)/(xj-xi)`` (tick units per x unit); the median is the
    explicit two-middle formula — elements at positions ceil(m/2) and
    ceil((m+1)/2) of the slope-sorted list, averaged — identical
    arithmetic on any engine (never an engine's median() whose
    interpolation form may differ in the last bit). Slopes are
    de-ticked by ``y_scale`` at the end, unrounded (pure rational).

    Scale: pair generation and the rank window both run over the
    per-group pair GRID (C(|x grid|,2) rows — see _pair_grid), with the
    window partitioned by group. Groups with < 2 points yield no row.
    n_points counts the SAME (x, y-non-null) grid the pairs are built
    from, so n_pairs == C(n_points, 2) holds by construction.
    """
    pts, pairs = _pair_grid(df, group_col, x_col, y_col, y_scale)
    slope = (F.col("yj") - F.col("yi")).cast("double") / (
        F.col("xj") - F.col("xi")
    ).cast("double")
    # deterministic rank order: ties on the slope value are positionally
    # interchangeable for middle-element selection
    ranked = pairs.select("g", slope.alias("s"), "xi", "xj").select(
        "g", "s", F.row_number().over(
            Window.partitionBy("g").orderBy("s", "xi", "xj")
        ).alias("i")
    )
    m = ranked.groupBy("g").agg(F.count(F.lit(1)).alias("m"))
    mid = ranked.join(F.broadcast(m), "g").where(
        (F.col("i") == F.ceil(F.col("m") / 2))
        | (F.col("i") == F.ceil((F.col("m") + 1) / 2))
    )
    npts = pts.groupBy("g").agg(F.count(F.lit(1)).alias("n_points"))
    out = (
        mid.groupBy("g")
        .agg(
            F.first("m").alias("n_pairs"),
            # one or two middle rows; avg of <= 2 doubles is exact-form
            (F.sum("s") / F.count(F.lit(1))).alias("sen_ticks"),
        )
        .join(npts, "g")
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_points",
        "n_pairs",
        (F.col("sen_ticks") / F.lit(float(y_scale))).alias("sen_slope"),
    )


def mann_kendall(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    y_scale: int = 100,
) -> DataFrame:
    """(group, n_points, s_stat, z): the Mann-Kendall monotonic-trend
    test per group — S = sum over i<j of sign(y_j - y_i), with the
    tie-corrected normal approximation
    ``Var = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18`` and the
    continuity-corrected z — the non-parametric "is this metric
    actually trending" gate that pairs with :func:`theil_sen`'s "how
    fast" (same pair grid, same quantization).

    S and Var are pure integer arithmetic (decimal-exact); z is the
    one transcendental output, half-even-rounded to 1e-9. Groups with
    fewer than 2 points emit NULL z (Var = 0).
    """
    pts, pairs = _pair_grid(df, group_col, x_col, y_col, y_scale)
    s_term = F.signum((F.col("yj") - F.col("yi")).cast("double")).cast(
        "long"
    )
    s = pairs.groupBy("g").agg(F.sum(s_term).alias("s_stat"))
    n = pts.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ties = (
        pts.groupBy("g", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                dec(F.col("t"))
                * dec(F.col("t") - 1)
                * dec(2 * F.col("t") + 5)
            ).alias("tt")
        )
    )
    j = n.join(s, "g", "left").join(ties, "g", "left")
    nn = F.col("n").cast("decimal(38,0)")
    var18 = nn * (nn - 1) * (2 * nn + 5) - F.coalesce(
        F.col("tt"), F.lit(0).cast("decimal(38,0)")
    )
    var = var18.cast("double") / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    zraw = (
        sd
        - F.when(sd > 0, F.lit(1.0))
        .when(sd < 0, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    ) / F.sqrt(var)
    return j.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_points"),
        F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
        F.when(var > 0, F.bround(zraw, 9)).alias("z"),
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(group, n, d2_sum, rho): Spearman rank correlation between two
    metrics per group — "do these series move together MONOTONICALLY"
    — the robust complement to the Pearson ``corr`` family (X30): a
    nonlinear but monotone coupling scores rho = 1 here while Pearson
    dilutes, and a single outlier pair moves rho by O(1/n) instead of
    O(outlier).

    Ranks are ``row_number`` over (metric, tiebreak) — a PINNED total
    order (deterministic distinct ranks; the convention, mirrored in
    the oracle, trades midrank tie handling for exactness — with a
    tiebreak column the rank vector is unique, so
    ``rho = 1 - 6*sum(d^2) / (n(n^2-1))`` is EXACT: d^2 sums in
    decimal(38,0) and rho is one exact-int double ratio, shipped
    unrounded). Rows with NULL in either metric are excluded. Groups
    with n < 2 yield NULL rho.

    Scale: two rank windows partitioned by GROUP over the (group, x, y)
    rows + one aggregation — for per-group series this is the calendar-
    bounded window class (daily/weekly rollups), never corpus-sized
    partitions.
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.col(tiebreak_col).alias("tb"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    wx = Window.partitionBy("g").orderBy("x", "tb")
    wy = Window.partitionBy("g").orderBy("y", "tb")
    ranked = base.select(
        "g",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d = (F.col("rx") - F.col("ry")).cast("decimal(38,0)")
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).alias("d2_sum"),
    )
    nd = F.col("n").cast("double")
    rho = F.lit(1.0) - F.lit(6.0) * F.col("d2_sum").cast("double") / (
        nd * (nd * nd - 1.0)
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.col("d2_sum").cast("long").alias("d2_sum"),
        F.when(F.col("n") > 1, rho).alias("rho"),
    )


def cross_correlation(
    a: DataFrame,
    b: DataFrame,
    date_col: str,
    value_col: str,
    max_lag: int = 3,
    ticks: int = 100,
) -> DataFrame:
    """(lag, n_pairs, r): lead-lag Pearson cross-correlation between
    two daily series at calendar lags -``max_lag``..+``max_lag`` — "do
    clicks TODAY predict purchases in two days": the alignment readout
    behind attribution windows (X44) and conversion-latency SLAs (X71).
    ``r[lag]`` correlates a's value at date d with b's at d + lag, so a
    peak at POSITIVE lag means a LEADS b.

    Pairs are matched by CALENDAR date (d vs d + lag days) over the
    inner join of observed dates — a gap day pairs with nothing, the
    convention that keeps lag semantics physical (the ACF's
    observation-index convention would slide across gaps). Values
    quantize to ``ticks`` units; (n, Sx, Sy, Sxy, Sxx, Syy) accumulate
    in decimal(38,0) and

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    is evaluated over exact integers — sqrt is the one transcendental,
    so r ships bround 1e-9 (the z-statistic convention). Degenerate
    sides (zero variance) and empty overlaps yield NULL.

    Scale: the lag fan-out is |lags| copies of the SMALLER daily frame
    (2*max_lag+1 rows per day — bounded by calendar, not corpus), one
    equi-join on the shifted date, one partial-agg groupBy(lag).
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    q = lambda df: (  # noqa: E731
        df.select(
            F.col(date_col).cast("date").alias("d"),
            F.round(F.col(value_col).cast("double") * ticks)
            .cast("long")
            .alias("v"),
        ).where(F.col("v").isNotNull() & F.col("d").isNotNull())
    )
    xa, xb = q(a), q(b)
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    # pair (d, x) with b at (d + lag): shift b's date by -lag so the
    # join key is plain d
    shifted = xb.select(F.col("v").alias("__y"), F.col("d"), lags).select(
        "__y", F.date_sub(F.col("d"), F.col("lag")).alias("d"), "lag"
    )
    j = xa.join(shifted, "d")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec(F.col("v"))).alias("__sx"),
        F.sum(dec(F.col("__y"))).alias("__sy"),
        F.sum(dec(F.col("v")) * dec(F.col("__y"))).alias("__sxy"),
        F.sum(dec(F.col("v")) * dec(F.col("v"))).alias("__sxx"),
        F.sum(dec(F.col("__y")) * dec(F.col("__y"))).alias("__syy"),
    )
    n = dec(F.col("n_pairs"))
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    r = F.bround(
        num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
        9,
    )
    return st.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when((vx > 0) & (vy > 0), r).alias("r"),
    ).orderBy("lag")
