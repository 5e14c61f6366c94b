"""Rolling z-score anomaly detection over an event stream.

Reference scope: the reference plots its series for eyeballing
(data_viz.py); the production counterpart is automated outlier flagging —
"this event's value is k sigmas from this user's recent behavior".

Scale design (100 TB): one window pass partitioned by the entity key —
a single Exchange, per-key state is the trailing ``lookback`` rows, no
UDF. The z-test is evaluated in EXACT integer arithmetic: values are
quantized to integer ticks (the fixture's 2-decimal values are exact at
scale 100), the rolling first and second moments are integer sums, and
|z| > z_thresh is tested as

    (n-1) * (n*x - s1)^2  >  z^2 * n * (n*s2 - s1^2)

which is the same inequality with every division cleared — no float
summation order, no sqrt, bit-identical across engines and partial-agg
merge orders (the same quantize-first discipline as sma_exact_cents).
Overflow headroom: with ticks < 2^16 and lookback <= 64 the left side is
< 2^51 — comfortably inside long arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def flag_anomalies(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lookback: int = 20,
    min_history: int = 8,
    z_thresh: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Flag events whose value deviates more than ``z_thresh`` sample
    standard deviations from the mean of the preceding ``lookback``
    events of the same key (the current row is excluded from its own
    baseline). Rows with fewer than ``min_history`` preceding events are
    not scored. Returns only the flagged rows, with the baseline size.
    """
    q = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-lookback, -1)
    )
    scored = (
        events.withColumn("_q", q)
        .withColumn("_n", F.count("_q").over(w))
        .withColumn("_s1", F.sum("_q").over(w))
        .withColumn("_s2", F.sum(F.col("_q") * F.col("_q")).over(w))
    )
    n, s1, s2, x = (F.col(c) for c in ("_n", "_s1", "_s2", "_q"))
    num = (n - 1) * (n * x - s1) * (n * x - s1)
    den = F.lit(z_thresh * z_thresh) * n * (n * s2 - s1 * s1)
    return (
        scored.filter((n >= min_history) & (num > den))
        .select(
            order_tiebreak,
            key_col,
            ts_col,
            value_col,
            n.cast("long").alias("baseline_n"),
        )
    )


def change_point(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    ticks: int = 1,
) -> DataFrame:
    """Per-series offline change-point detection (CUSUM argmax): the
    single index where splitting the series best separates two means —
    the "when did this metric's regime shift" readout complementing
    `flag_anomalies`' pointwise outlier test.

    For series x_1..x_n the CUSUM against the global mean is
    ``c_t = s_t - t * (S / n)``; the change point is the t maximizing
    |c_t| (earliest t on ties). Computed as the SCALED-EXACT integer
    ``n * s_t - t * S`` (ticks-quantized values, decimal(38,0) products)
    so the argmax — the decision that matters — involves no floating
    point at all; the reported means/shift are exact integer ratios.

    Output per key: (key, t, n, mean_before, mean_after, shift) with
    ``t`` the 1-based index of the LAST point of the left segment
    (1 <= t < n); series with n < 2 yield no row.

    Scale design (100 TB): one per-key window Exchange (running sum +
    row_number share the sort), one `max_by` aggregation per key — the
    Pregel-free single-pass shape; no corpus-sized second scan (S and n
    ride the same window, frame-unbounded).
    """
    from pyspark.sql import Window

    q = F.round(F.col(value_col).cast("double") * ticks).cast("long")
    w = Window.partitionBy(key_col).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = (
        df.select(F.col(key_col), F.col(order_col), q.alias("__q"))
        .withColumn("__t", F.row_number().over(w).cast("long"))
        .withColumn(
            "__s", F.sum(F.col("__q").cast("decimal(38,0)")).over(run)
        )
        .withColumn("__n", F.count(F.lit(1)).over(full).cast("long"))
        .withColumn(
            "__tot", F.sum(F.col("__q").cast("decimal(38,0)")).over(full)
        )
    )
    c = (
        F.col("__n").cast("decimal(38,0)") * F.col("__s")
        - F.col("__t").cast("decimal(38,0)") * F.col("__tot")
    )
    cand = d.where(F.col("__t") < F.col("__n")).withColumn(
        "__absc", F.abs(c)
    )
    # max_by struct: largest |c|, ties to the EARLIEST index
    pick = F.max_by(
        F.struct("__t", "__s", "__n", "__tot"),
        F.struct(F.col("__absc"), (-F.col("__t")).alias("nt")),
    )
    out = cand.groupBy(key_col).agg(pick.alias("__p"))
    t = F.col("__p.__t")
    s = F.col("__p.__s")
    n = F.col("__p.__n")
    S = F.col("__p.__tot")
    qt = F.lit(float(ticks))
    mb = s.cast("double") / qt / t.cast("double")
    ma = (S - s).cast("double") / qt / (n - t).cast("double")
    return out.select(
        key_col,
        t.alias("t"),
        n.alias("n"),
        mb.alias("mean_before"),
        ma.alias("mean_after"),
        (ma - mb).alias("shift"),
    )

def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """(group, n, med, mad, n_outliers): the robust outlier profile per
    group — median + median-absolute-deviation, flagging values where
    ``|v - med| > k * 1.4826 * MAD`` (1.4826 scales MAD to sigma under
    normality). The robust counterpart to the rolling z-score above:
    z-scores let one extreme value inflate its own sigma and hide; MAD
    does not (50% breakdown point), which is what a data-quality gate
    over heavy-tailed metrics needs.

    Both medians are exact interpolated percentiles rounded half-even
    to 1e-6 BEFORE comparison (the winsorize fence discipline); the
    deviation compare quantizes |v - med| the same way so an engine-ulp
    cannot flip a fence-sitter. NULL values are excluded.

    Scale: two aggregations over the data (group medians, then MAD of
    the deviations) + one final count aggregation; the join back is
    |groups|-sized (broadcast). No windows.
    """
    v = F.col(value_col).cast("double")
    base = df.select(F.col(group_col).alias("g"), v.alias("v")).where(
        F.col("v").isNotNull()
    )
    med = base.groupBy("g").agg(
        F.bround(F.expr("percentile(v, 0.5)"), 6).alias("med")
    )
    dev = base.join(F.broadcast(med), "g").select(
        "g", "v", "med", F.bround(F.abs(F.col("v") - F.col("med")), 6).alias("d")
    )
    mad = dev.groupBy("g").agg(
        F.bround(F.expr("percentile(d, 0.5)"), 6).alias("mad")
    )
    fence = F.bround(F.lit(k) * F.lit(1.4826) * F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum((F.col("d") > fence).cast("long")).alias("n_outliers"),
        )
        .select(
            F.col("g").alias(group_col), "n", "med", "mad", "n_outliers"
        )
    )

def seasonal_adjusted_anomalies(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """(group, date, raw_cents, adjusted, z, is_anomaly): daily totals
    DESEASONALIZED by the X75 weekly profile before z-scoring — the
    incident detector that does NOT page every Sunday: a 0.7x weekend
    index divides out, so only deviations from the group's OWN weekly
    rhythm flag. Composes seasonal_profile (one grid) with the
    population z-score over the adjusted daily series.

    Exactness: daily sums are exact cents; the seasonal index joins by
    (group, isodow); adjusted = raw / index is one double ratio,
    quantized half-even to 1e-6 BEFORE the moment sums (the fence
    discipline) so z and the flag are engine-identical; z bround 1e-9.
    Days whose isodow index is NULL or 0 (a group never active on that
    weekday in the profile window) are excluded rather than divided
    into infinity.

    Scale: one scan to the (group, date) daily grid, the |groups| x 7
    profile broadcast back, moments per group over the daily grid
    (map-side combine) — no data-sized window.
    """
    from ..operators.resample import seasonal_profile

    prof = seasonal_profile(events, ts_col, value_col, group_col).select(
        F.col(group_col).alias("g"),
        "isodow",
        "seasonal_index",
    )
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    epoch_day = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01"))
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.col(ts_col).cast("date").alias("date"),
            (F.pmod(epoch_day + 3, F.lit(7)) + 1).cast("long").alias(
                "isodow"
            ),
            cents.alias("__c"),
        )
        .where(F.col("__c").isNotNull())
        .groupBy("g", "date", "isodow")
        .agg(F.sum("__c").alias("raw_cents"))
    )
    adj = (
        daily.join(F.broadcast(prof), ["g", "isodow"])
        .where(
            F.col("seasonal_index").isNotNull()
            & (F.col("seasonal_index") != 0)
        )
        .select(
            "g",
            "date",
            "raw_cents",
            F.bround(
                F.col("raw_cents").cast("double")
                / F.col("seasonal_index"),
                6,
            ).alias("adjusted"),
        )
    )
    qadj = F.round(F.col("adjusted") * F.lit(1e6)).cast("decimal(38,0)")
    mom = adj.select("g", qadj.alias("qa")).groupBy("g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("qa").alias("__s1"),
        F.sum(F.col("qa") * F.col("qa")).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s1").cast("double") / F.lit(1e6) / n
    var = (
        F.col("__s2").cast("double") / F.lit(1e12) / n - mean * mean
    )
    z = F.when(
        var > 0, (F.col("adjusted") - mean) / F.sqrt(var)
    )
    return (
        adj.join(F.broadcast(mom), "g")
        .select(
            F.col("g").alias(group_col),
            "date",
            "raw_cents",
            "adjusted",
            F.bround(z, 9).alias("z"),
            F.coalesce(
                F.abs(F.bround(z, 9)) >= F.lit(z_threshold), F.lit(False)
            ).alias("is_anomaly"),
        )
    )


def ewma_control_chart(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    span: int = 10,
    limit_sigmas: float = 3.0,
    max_group_rows: int = 200_000,
) -> DataFrame:
    """(group, date, day_value, ewma, is_breach): the EWMA control
    chart over each group's daily totals — the small-persistent-shift
    detector beside the spike detectors (a 0.5-sigma drift never trips
    a z-score or MAD fence; the EWMA accumulates it): breach when the
    smoothed line leaves mean ± L·sigma·sqrt(a/(2-a)) (the asymptotic
    EWMA control limit, Lucas & Saccucci 1990), a = 2/(span+1). The
    first ``span`` points never flag (burn-in): the asymptotic band is
    too tight for the startup transient, where the EWMA still carries
    most of its seed value — the standard practical guard, and exactly
    mirrorable (a step index, not a transcendental time-varying band
    that pow()'s cross-engine ulp would poison).

    Exactness discipline (the logreg/pagerank recursion rule, applied
    to a pandas fold): the recursion ``e_t = a·x_t + (1-a)·e_{t-1}``
    runs in DOLLARS (O(1e2-1e3) magnitude) with EVERY step's result
    rounded half-even to 1e-6 via numpy round — numpy and DuckDB's
    round_even both scale through doubles, so a recursive CTE replays
    the fold bit-exactly (dollars + 1e-6 keeps the scaled value inside
    2^53, the regime where that method is exact; cents + 1e-9 would
    not be). mean/sigma come from exact decimal micro-unit sums; the
    breach fence rounds both sides to 1e-6 before comparing.

    The fold is the documented legitimate Pandas case (per-key
    sequential state, Arrow-batched, one group per series); day counts
    bound each group's rows, so a series is calendar-sized, never
    corpus-sized. That contract is ENFORCED, not assumed: the fold is
    the only per-row Python loop in the repo, and it raises if any
    group exceeds ``max_group_rows`` (default 200k ≈ 500 years of
    daily points) — a caller who re-keys the chart by a data-sized
    column (per-entity raw series instead of per-group daily totals)
    gets a loud error, never a silent corpus-sized driver-style loop
    on an executor.
    """
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    if max_group_rows < 1:
        raise ValueError(
            f"max_group_rows must be >= 1, got {max_group_rows}"
        )
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a = 2.0 / (span + 1)
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.col(ts_col).cast("date").alias("date"),
            cents.alias("__c"),
        )
        .where(F.col("__c").isNotNull())
        .groupBy("g", "date")
        .agg(F.sum("__c").alias("__cents"))
        .select(
            "g",
            "date",
            (F.col("__cents").cast("double") / 100.0).alias("day_value"),
        )
    )

    schema = T.StructType(
        [
            T.StructField("g", daily.schema["g"].dataType, True),
            T.StructField("date", T.DateType(), True),
            T.StructField("day_value", T.DoubleType(), True),
            T.StructField("ewma", T.DoubleType(), True),
            T.StructField("step", T.LongType(), True),
        ]
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) > max_group_rows:
            g = pdf["g"].iloc[0] if len(pdf) else "?"
            raise ValueError(
                f"ewma_control_chart: group {g!r} has {len(pdf)} rows, "
                f"over the calendar-bounded contract of "
                f"{max_group_rows} — the chart folds daily TOTALS per "
                f"group; re-key or pre-aggregate the input"
            )
        pdf = pdf.sort_values("date").reset_index(drop=True)
        out = []
        e = None
        for x in pdf["day_value"].astype("float64"):
            e = x if e is None else a * x + (1.0 - a) * e
            e = float(np.round(e, 6))
            out.append(e)
        pdf["ewma"] = out
        pdf["step"] = range(1, len(out) + 1)
        return pdf

    smoothed = daily.groupBy("g").applyInPandas(fold, schema)

    qv = F.round(F.col("day_value") * F.lit(1e6)).cast("decimal(38,0)")
    mom = daily.select("g", qv.alias("q")).groupBy("g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("q").alias("__s1"),
        F.sum(F.col("q") * F.col("q")).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s1").cast("double") / F.lit(1e6) / n
    var = F.col("__s2").cast("double") / F.lit(1e12) / n - mean * mean
    width = F.bround(
        F.lit(limit_sigmas)
        * F.sqrt(var)
        * F.sqrt(F.lit(a) / F.lit(2.0 - a)),
        6,
    )
    return (
        smoothed.join(F.broadcast(mom), "g")
        .select(
            F.col("g").alias(group_col),
            "date",
            "day_value",
            "ewma",
            F.when(
                (var > 0) & (F.col("step") > span),
                F.bround(F.abs(F.col("ewma") - mean), 6) > width,
            )
            .otherwise(F.lit(False))
            .alias("is_breach"),
        )
    )


def cusum_chart(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    slack_pct: int = 5,
    h_sigmas: float = 4.0,
) -> DataFrame:
    """(group, date, day_value, cusum_pos, cusum_neg, is_breach): the
    two-sided tabular CUSUM chart over each group's daily totals — the
    classical persistent-shift detector beside :func:`ewma_control_
    chart` (Page 1954: EWMA weights recency smoothly; CUSUM accumulates
    every excursion past a slack band and detects sustained small
    shifts fastest). ``C+_i = max(0, C+_{i-1} + x_i - (mu + K))``,
    ``C-_i = max(0, C-_{i-1} + (mu - K) - x_i)``, K = ``slack_pct``% of
    the group mean; breach when either side exceeds ``h_sigmas`` daily
    sigmas.

    NO recursion and NO Python: the max(0, ...) fold linearizes through
    the running-minimum identity ``C+_i = CS_i - min(0, min_{j<=i}
    CS_j)`` with ``CS = cumsum(x - mu - K)`` — two cumulative windows
    per side over the per-group DAILY grid (calendar-bounded partitions,
    the sessionize window class), where the EWMA recursion needed an
    Arrow fold. This is the vectorization the EWMA's docstring rules
    out for itself: CUSUM's fold is piecewise-linear in prefix sums,
    EWMA's is a geometric contraction.

    Exactness: with integer day-cents ``c_i``, mean ``s1/n`` and slack
    ``slack_pct*s1/(100*n)``, every CS term scales to the exact integer
    ``100*n*c_i - (100 + slack_pct)*s1`` (positive side; ``- (100 -
    slack_pct)*s1`` negative side) accumulated in decimal(38,0); the
    reported dollar CUSUMs are single exact-int double ratios (divisor
    ``100*n*100``), shipped UNROUNDED (pure rational). The breach fence
    is the one transcendental comparison — both sides bround 1e-6, the
    EWMA convention.
    """
    if not 0 <= slack_pct <= 100:
        raise ValueError(f"slack_pct must be in [0, 100], got {slack_pct}")
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.col(ts_col).cast("date").alias("date"),
            cents.alias("__c"),
        )
        # NULL ts → NULL date would sort FIRST under Spark's ORDER BY
        # but LAST under the DuckDB oracle's, corrupting every prefix
        # sum in the group — exclude it, the skipgram_sequences NULL-ts
        # convention (ADVICE r7).
        .where(F.col("__c").isNotNull() & F.col("date").isNotNull())
        .groupBy("g", "date")
        .agg(F.sum("__c").alias("__cents"))
    )
    qv = F.col("__cents").cast("decimal(38,0)")
    mom = daily.groupBy("g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(qv).alias("__s1"),
        F.sum(qv * qv).alias("__s2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = daily.join(F.broadcast(mom), "g")
    # exact integer CS terms, scaled by 100*n (see docstring)
    up_term = (
        dec(F.lit(100)) * dec(F.col("__n")) * dec(F.col("__cents"))
        - dec(F.lit(100 + slack_pct)) * F.col("__s1")
    )
    dn_term = (
        dec(F.lit(100 - slack_pct)) * F.col("__s1")
        - dec(F.lit(100)) * dec(F.col("__n")) * dec(F.col("__cents"))
    )
    w = Window.partitionBy("g").orderBy("date").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs_up = F.sum(up_term).over(w)
    cs_dn = F.sum(dn_term).over(w)
    run = j.select(
        "g",
        "date",
        (F.col("__cents").cast("double") / 100.0).alias("day_value"),
        "__n",
        "__s1",
        "__s2",
        cs_up.alias("__csu"),
        cs_dn.alias("__csd"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    minu = F.least(zero, F.min("__csu").over(w))
    mind = F.least(zero, F.min("__csd").over(w))
    scale = F.col("__n").cast("double") * 10000.0  # 100*n cents -> dollars
    n = F.col("__n").cast("double")
    mean = F.col("__s1").cast("double") / 100.0 / n
    var = (
        F.col("__s2").cast("double") / 10000.0 / n - mean * mean
    )
    fence = F.bround(F.lit(h_sigmas) * F.sqrt(var), 6)
    cpos = (F.col("__csu") - minu).cast("double") / scale
    cneg = (F.col("__csd") - mind).cast("double") / scale
    return (
        run.select(
            "g",
            "date",
            "day_value",
            "__n",
            "__s1",
            "__s2",
            cpos.alias("cusum_pos"),
            cneg.alias("cusum_neg"),
        )
        .select(
            F.col("g").alias(group_col),
            "date",
            "day_value",
            "cusum_pos",
            "cusum_neg",
            F.when(
                var > 0,
                (F.bround(F.col("cusum_pos"), 6) > fence)
                | (F.bround(F.col("cusum_neg"), 6) > fence),
            )
            .otherwise(F.lit(False))
            .alias("is_breach"),
        )
    )
