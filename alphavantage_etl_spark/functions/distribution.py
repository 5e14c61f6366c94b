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

from pyspark.sql import DataFrame, Window, functions as F


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


def population_stability(
    base: DataFrame,
    curr: DataFrame,
    value_col: str,
    nbins: int = 10,
) -> DataFrame:
    """Per-bin population stability index (PSI) between a baseline and a
    current snapshot of a numeric column — THE production drift monitor:
    ``psi_term = (q_i - p_i) * ln(q_i / p_i)`` per bin, sum >= 0.2 is the
    conventional "investigate" threshold.

    Bin edges are the BASELINE's exact interpolated quantiles (the
    standard convention — drift is measured against where the baseline
    mass was), rounded half-even to 1e-6 before comparison (winsorize
    discipline); values on an edge go to the upper bin; NULL values are
    excluded from both snapshots. Bin shares use add-one (Laplace)
    smoothing ``(n_i + 1) / (N + nbins)`` so an empty bin contributes a
    finite, deterministic term instead of an infinite log.

    Output: one row per bin (all ``nbins`` bins present even when
    empty): (bin, n_base, n_curr, psi_term), psi_term half-even-rounded
    to 1e-12. ``sum(psi_term)`` is the headline PSI.

    Scale design (100 TB): one aggregation per snapshot for the bin
    counts (map-side collapse to <= nbins groups) after a broadcast of
    the bin-edge row; everything downstream is nbins-bounded. The edges
    themselves are one exact-percentile aggregation of the baseline —
    swap in an approx-percentile sketch at extreme scale if the exact
    pass is too hot (the GK sketch in operators/sketches.py composes).
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    probs = ", ".join(str(i / nbins) for i in range(1, nbins))
    bounds = base.agg(
        F.expr(
            f"transform(percentile({value_col}, array({probs})),"
            " b -> bround(b, 6))"
        ).alias("__bounds")
    )
    v = F.col(value_col)

    def _bin_counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.where(v.isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(
                F.size(F.filter(F.col("__bounds"), lambda b: v >= b))
                .cast("long")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    b_cnt = _bin_counts(base, "n_base")
    c_cnt = _bin_counts(curr, "n_curr")
    spark = base.sparkSession
    spine = spark.range(nbins).select(F.col("id").alias("bin"))
    joined = (
        spine.join(b_cnt, on="bin", how="left")
        .join(c_cnt, on="bin", how="left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
        )
    )
    tot = joined.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_curr").alias("__tc")
    )
    p = (F.col("n_base") + 1).cast("double") / (
        F.col("__tb") + F.lit(nbins)
    ).cast("double")
    q = (F.col("n_curr") + 1).cast("double") / (
        F.col("__tc") + F.lit(nbins)
    ).cast("double")
    return joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_curr",
        F.bround((q - p) * F.log(q / p), 12).alias("psi_term"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One-row frame (n_rows, n_cells, mi, h_x, h_y, nmi): mutual
    information and marginal entropies (natural log) between two
    categorical columns, plus the sqrt-normalized MI in [0, 1] — the
    feature-association / leakage-detection profile ("does `source`
    predict `label`?", "is this split independent of language?").

    NULL categories count as a regular level (a real category in drift
    terms), implemented as a (is-null flag, coalesced value) compound
    grouping key — collision-free by construction, unlike a string
    sentinel that a genuine category value could silently merge with.

    Determinism discipline: all probabilities are ratios of exact counts;
    each cell's MI term ``(n_xy/N) * ln(N*n_xy/(n_x*n_y))`` and each
    marginal's entropy term are half-even-quantized to 1e-12 BEFORE
    summation and summed as exact decimal(38,0) integers over the
    (|X|*|Y|)-bounded grid — bit-identical across engines and partial-agg
    merge orders. ``nmi = mi/sqrt(h_x*h_y)`` is one fixed-order double
    expression over the three quantized sums, rounded half-even to 1e-9
    (NULL when either entropy is 0 — a constant column carries no
    information to normalize).

    Scale design (100 TB): ONE corpus scan — the (x, y) grid aggregation
    (map-side combine collapses to <= |X|*|Y| rows per task); marginals
    and N derive from the GRID, not the corpus (two tiny aggs + AQE
    broadcast joins). Everything downstream of the grid is
    cardinality-bounded regardless of corpus size.
    """
    q = 12
    quant = F.lit(10.0**q)
    x = F.struct(
        F.col(x_col).isNull().alias("n"),
        F.coalesce(F.col(x_col).cast("string"), F.lit("")).alias("v"),
    ).alias("__x")
    y = F.struct(
        F.col(y_col).isNull().alias("n"),
        F.coalesce(F.col(y_col).cast("string"), F.lit("")).alias("v"),
    ).alias("__y")
    grid = (
        df.select(x, y)
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__nxy"))
        .persist()  # grid-bounded state; read by 4 downstream aggs
    )
    gx = grid.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    gy = grid.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    tot = grid.agg(F.sum("__nxy").alias("__n"))

    def _h(marg: DataFrame, cnt: str) -> DataFrame:
        # -sum p ln p, quantized per level, exact integer sum
        term = F.round(
            F.bround(
                -(F.col(cnt).cast("double") / F.col("__n").cast("double"))
                * F.log(
                    F.col(cnt).cast("double") / F.col("__n").cast("double")
                ),
                q,
            )
            * quant
        ).cast("decimal(38,0)")
        return marg.crossJoin(F.broadcast(tot)).agg(F.sum(term).alias("__qh"))

    mi_term = F.round(
        F.bround(
            (F.col("__nxy").cast("double") / F.col("__n").cast("double"))
            * F.log(
                (F.col("__n").cast("double") * F.col("__nxy").cast("double"))
                / (F.col("__nx").cast("double") * F.col("__ny").cast("double"))
            ),
            q,
        )
        * quant
    ).cast("decimal(38,0)")
    mi_sum = (
        grid.join(F.broadcast(gx), on="__x")
        .join(F.broadcast(gy), on="__y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(mi_term).alias("__qmi"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.first("__n").alias("n_rows"),
        )
    )
    hx = _h(gx, "__nx").withColumnRenamed("__qh", "__qhx")
    hy = _h(gy, "__ny").withColumnRenamed("__qh", "__qhy")
    mi_d = F.col("__qmi").cast("double") / quant
    hx_d = F.col("__qhx").cast("double") / quant
    hy_d = F.col("__qhy").cast("double") / quant
    return (
        mi_sum.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            "n_cells",
            mi_d.alias("mi"),
            hx_d.alias("h_x"),
            hy_d.alias("h_y"),
            F.when(
                (F.col("__qhx") > 0) & (F.col("__qhy") > 0),
                F.bround(mi_d / F.sqrt(hx_d * hy_d), 9),
            ).alias("nmi"),
        )
    )


def quantile_normalize(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Append ``qnorm``: the value's percent-rank WITHIN its group —
    rank-based score normalization, the standard fix for combining
    quality/perplexity scores across sources whose raw scales differ (a
    0.7 from a clean-web source and a 0.7 from a forum dump are not the
    same signal; their within-source quantiles are comparable).

    ``qnorm = |strictly smaller in group| / (n_group - 1)`` — exactly
    SQL ``percent_rank()``, ties share a value, single-row groups pin to
    0.0, NULL values rank as NULL. One int/int division per distinct
    value: bit-exact across engines.

    Scale design (100 TB): NEVER a per-group window over the data — the
    rank comes from the (group, value) GRID: one partial-aggregated
    count per distinct value, a cumulative window over the grid (grid-
    bounded, quality scores are heavily tied), and one join back keyed
    on (group, value) that AQE broadcasts when the grid is small. A
    naive ``percent_rank().over(partitionBy(group))`` would instead
    sort entire-source partitions — the single-partition-window killer
    for a 5-source corpus.
    """
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    grid = g.select(
        group_col,
        value_col,
        (F.sum("__c").over(w_cum) - F.col("__c")).alias("__below"),
        F.sum("__c").over(w_all).alias("__n"),
    ).select(
        group_col,
        value_col,
        F.when(
            F.col("__n") > 1,
            F.col("__below").cast("double")
            / (F.col("__n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("qnorm"),
    )
    return df.join(grid, [group_col, value_col], "left")


def ks_test(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    ticks: int = 100,
    max_grid: int = 1_000_000,
) -> DataFrame:
    """One-row (n_a, n_b, ks_d): the two-sample Kolmogorov-Smirnov
    statistic — max over values of |ECDF_a - ECDF_b| — the EXACT
    distribution-equality test beside the binned PSI monitor (PSI sees
    only nbins cells; KS sees every quantized value, so a shift PSI's
    bins straddle still registers). NULL values are excluded; empty
    sides yield a NULL statistic rather than a fabricated 0.

    Values quantize to ``ticks`` units (cents by default) so the value
    GRID — not the data — drives everything past the per-side counts:
    one full-outer merge of the two count tables, one cumulative window
    over the grid, one max. Each ECDF value is an exact int/int ratio;
    the max of identical doubles is engine-identical unrounded.

    Scale: the cumulative window runs over the DISTINCT-quantized-value
    grid in a single partition — bounded by the metric's quantized
    range (the head-bounded window class), never by row count. That
    bound is ENFORCED, not advised: one bounded probe job counts the
    grid (early-exit at ``max_grid + 1``), and a grid wider than
    ``max_grid`` is auto-coarsened onto <= ``max_grid`` equal-width
    cells over the observed [min, max] span before the cumulative
    window, so a wide-range double column can never hand the window a
    data-sized single partition. Coarsening preserves per-side counts
    exactly; the reported ``ks_d`` becomes the max over cell BOUNDARIES
    — a lower bound on the exact statistic that converges as max_grid
    grows (error <= the largest probability mass inside one cell).
    Below the bound (the default ``ticks=100`` money grid always is)
    results are bit-identical to the unguarded form.
    """
    q = lambda df: (  # noqa: E731
        df.select(
            F.round(F.col(value_col).cast("double") * ticks)
            .cast("long")
            .alias("v")
        )
        .where(F.col("v").isNotNull())
    )
    if max_grid < 2:
        raise ValueError(f"max_grid must be >= 2, got {max_grid}")
    ca = q(a).groupBy("v").agg(F.count(F.lit(1)).alias("na_v"))
    cb = q(b).groupBy("v").agg(F.count(F.lit(1)).alias("nb_v"))
    grid = (
        ca.join(cb, "v", "full")
        .select(
            "v",
            F.coalesce("na_v", F.lit(0)).alias("na_v"),
            F.coalesce("nb_v", F.lit(0)).alias("nb_v"),
        )
    )
    # bounded guard probe: is the grid wider than the single-partition
    # window can be trusted with?  limit() early-exits the count, so the
    # probe never materializes more than max_grid + 1 grid rows.
    if grid.limit(max_grid + 1).count() > max_grid:
        lo, hi = grid.agg(F.min("v"), F.max("v")).first()
        # ceil-div cell width puts the span into <= max_grid cells
        cell = (int(hi) - int(lo)) // max_grid + 1
        grid = (
            grid.groupBy(
                F.floor((F.col("v") - F.lit(int(lo))) / F.lit(cell)).alias(
                    "v"
                )
            )
            .agg(
                F.sum("na_v").alias("na_v"), F.sum("nb_v").alias("nb_v")
            )
        )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = grid.agg(
        F.sum("na_v").alias("__na"), F.sum("nb_v").alias("__nb")
    )
    ecdf = grid.select(
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
    ).crossJoin(F.broadcast(tot))
    d = F.abs(
        F.col("ca").cast("double") / F.col("__na").cast("double")
        - F.col("cb").cast("double") / F.col("__nb").cast("double")
    )
    return ecdf.agg(
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.max(
            F.when((F.col("__na") > 0) & (F.col("__nb") > 0), d)
        ).alias("ks_d"),
    )
