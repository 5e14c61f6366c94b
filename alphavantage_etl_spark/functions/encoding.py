"""Feature encoding for tabular ML pipelines: smoothed target encoding
(with the leakage-safe leave-one-out form) and exact-quantile
discretization (equi-depth binning).

Reference scope: none in the reference ETL; these extend the
feature-preparation family (X11 calibration, X29 winsorization) with the
two encodings a training pipeline applies right before export: replace a
high-cardinality category with a target statistic, and bucket a skewed
numeric into rank-stable bins.

Scale design (100 TB):
- Both operators are ONE aggregation producing a CATEGORY- or
  GROUP-bounded statistics table + one broadcast join + a projection —
  the corpus never shuffles. Skewed categories cost only their own scan
  (partial aggregation absorbs them map-side).
- Target sums are exact: the target quantizes to integer ticks and sums
  in decimal(38,0) (the indicator discipline) so the encoding is
  identical on any partitioning; the final blend is one fixed-order
  double expression left UNROUNDED — pure rational IEEE arithmetic over
  exactly-reproduced inputs is already bit-identical across engines
  (decimal rounding at ~1e5 magnitudes would break parity, not add it).
- Leave-one-out subtracts the ROW'S OWN tick value from its category
  sum in-expression — no second scan, no per-row shuffle — which is
  what makes target encoding usable on the training split without
  leaking each row's own label into its feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    ticks: int = 100,
    loo: bool = False,
) -> DataFrame:
    """Append ``enc`` (and ``enc_loo`` when ``loo``): the smoothed target
    mean of the row's category,
    ``enc = (sum_c + m * mu) / (n_c + m)`` with ``mu`` the global target
    mean and ``m`` the smoothing pseudo-count — rare categories shrink
    toward the prior instead of memorizing their few labels.

    ``enc_loo`` excludes the row's own target
    (``(sum_c - y_i + m * mu) / (n_c - 1 + m)``) — the standard
    leakage-safe form for encoding the training split. Rows with NULL
    target contribute to neither sum and their ``enc_loo`` equals
    ``enc``; a singleton category under ``smoothing=0`` has no data and
    no prior left after removing itself, so its ``enc_loo`` is NULL —
    and symmetrically a category whose targets are ALL NULL under
    ``smoothing=0`` has ``enc`` NULL (no data, no prior).
    NULL categories are a real level (null-safe join, the winsorize
    convention).
    """
    t = F.round(F.col(target_col).cast("double") * ticks).cast("long")
    qt = F.lit(float(ticks))
    per_cat = (
        df.select(F.col(cat_col).alias("__g"), t.alias("__t"))
        .groupBy("__g")
        .agg(
            F.count("__t").alias("__n"),
            F.coalesce(
                F.sum(F.col("__t").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__s"),
        )
    )
    tot = per_cat.agg(
        F.sum("__n").alias("__nn"), F.sum("__s").alias("__ss")
    )
    stats = per_cat.crossJoin(F.broadcast(tot)).select(
        "__g",
        "__n",
        "__s",
        (
            F.col("__ss").cast("double") / qt / F.col("__nn").cast("double")
        ).alias("__mu"),
    )
    m = F.lit(float(smoothing))
    # no rounding: the blend is PURE rational IEEE arithmetic over exactly
    # reproduced inputs (integer-tick sums, counts), so both engines build
    # the identical double bit-for-bit. Rounding would BREAK parity here:
    # at ~1e5 magnitudes a 1e-9 decimal grid is finer than the scaled-
    # double arithmetic DuckDB's round_even uses, while Spark's bround is
    # exact BigDecimal — they disagree in the last digit.
    # guard the m=0 all-NULL-target category: n+m = 0 leaves no data and
    # no prior — NULL, not 0/0 (NaN under non-ANSI, error under ANSI);
    # mirrors the enc_loo singleton guard below
    enc_denom = F.col("__n").cast("double") + m
    enc = F.when(
        enc_denom > 0,
        (F.col("__s").cast("double") / qt + m * F.col("__mu")) / enc_denom,
    )
    out = df.join(
        F.broadcast(stats), on=F.col(cat_col).eqNullSafe(F.col("__g"))
    )
    cols = [*df.columns, enc.alias("enc")]
    if loo:
        # guard the m=0 singleton: n-1+m = 0 leaves no data and no prior
        # to encode from — NULL, not an ANSI divide-by-zero
        denom = F.col("__n").cast("double") - 1 + m
        enc_loo = (
            F.when(t.isNull(), enc)
            .when(
                denom > 0,
                (
                    (F.col("__s") - t.cast("decimal(38,0)")).cast("double")
                    / qt
                    + m * F.col("__mu")
                )
                / denom,
            )
        )
        cols.append(enc_loo.alias("enc_loo"))
    return out.select(*cols)


def quantile_discretize(
    df: DataFrame,
    value_col: str,
    nbins: int,
    group_col: str | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Append ``out_col``: the row's equi-depth bin in [0, nbins) under
    exact interpolated quantile boundaries (computed globally, or per
    ``group_col`` so a gate like "top decile" is distribution-free
    within each source — the calibrate_by_group motivation, but emitting
    a reusable *bin id* rather than a rank).

    Boundaries are half-even-rounded to 1e-6 BEFORE the comparison (the
    winsorize discipline) so an engine-ulp difference in interpolation
    cannot flip a fence-sitting value; a value equal to a boundary goes
    to the UPPER bin (``v >= b`` counts boundaries passed). NULL values
    get a NULL bin; NULL groups are a real level.
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    probs = ", ".join(str(i / nbins) for i in range(1, nbins))
    bexpr = F.expr(
        f"transform(percentile({value_col}, array({probs})),"
        " b -> bround(b, 6))"
    ).alias("__bounds")
    v = F.col(value_col)
    if group_col is None:
        bounds = df.agg(bexpr)
        joined = df.crossJoin(F.broadcast(bounds))
    else:
        bounds = (
            df.groupBy(group_col).agg(bexpr).withColumnRenamed(group_col, "__g")
        )
        joined = df.join(
            F.broadcast(bounds), on=F.col(group_col).eqNullSafe(F.col("__g"))
        )
    bin_ = F.when(
        v.isNotNull(),
        F.size(F.filter(F.col("__bounds"), lambda b: v >= b)).cast("long"),
    )
    return joined.select(*df.columns, bin_.alias(out_col))
