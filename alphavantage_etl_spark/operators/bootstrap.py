"""Poisson bootstrap — distribution-free confidence intervals for
per-group means at any scale: resample the data R times WITHOUT
materializing resamples, by giving every row an independent
Poisson(1)-distributed weight per replicate (the standard large-scale
bootstrap: multinomial resampling needs the global N per draw, Poisson
weights need only the row itself, so the whole thing is one pass).

Reference scope: none in the reference ETL; extends the statistics
family (X29 distribution tools, X31 OLS trend) with uncertainty
quantification — a mean without a CI is a point pretending to be a
fact.

Determinism: replicate weights derive from the content-addressed md5
bucket of (salt, replicate, id) compared against FIXED integer ladder
thresholds (the cumulative Poisson(1) CDF at 1e-4 resolution:
3679, 7358, 9197, 9810, 9963, 9994, 9999) — pure integer comparisons,
no float boundary anywhere, identical on any engine/partitioning; the
protocol's exactness is what matters (the 1e-4 CDF quantization is part
of the protocol, like the 10k-bucket hash_split). Values quantize to
integer ticks; every replicate mean is a ratio of exact integer sums.

Scale design (100 TB): the R-fold explode amplifies CPU, not shuffle —
per-(group, replicate) partial aggregation collapses map-side, so the
exchange carries |groups| x R rows regardless of data size; the CI is
one exact-percentile aggregation over the R-bounded replicate-mean
table per group (winsorize's interpolation parity, bounds rounded 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# cumulative Poisson(1) CDF at 1e-4 bucket resolution (protocol constants)
_LADDER = (3679, 7358, 9197, 9810, 9963, 9994, 9999)


def poisson_bootstrap_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str | None = None,
    n_replicates: int = 50,
    ticks: int = 100,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """([group,] n, mean, ci_lo, ci_hi) — the exact per-group mean plus
    the [alpha/2, 1-alpha/2] percentile bootstrap CI from
    ``n_replicates`` Poisson resamples. NULL values are excluded;
    replicates whose total weight in a group is 0 are skipped (their
    mean is undefined, not 0)."""
    if n_replicates < 2:
        raise ValueError(f"n_replicates must be >= 2, got {n_replicates}")
    gcols = [group_col] if group_col else []
    q = F.round(F.col(value_col).cast("double") * ticks).cast("long")
    base = df.where(F.col(value_col).isNotNull()).select(
        *gcols, F.col(id_col).alias("__id"), q.alias("__q")
    )
    point = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.col("__q").cast("decimal(38,0)")).cast("double")
            / F.lit(float(ticks))
            / F.count(F.lit(1)).cast("double")
        ).alias("mean"),
    )
    # the R-fold hash fan-out runs inside the stage carrying `base`
    from ..functions.parallelism import spread_scan

    base = spread_scan(base)
    rep = base.select(
        *gcols,
        "__id",
        "__q",
        # sequence() builds the same 0..n-1 BIGINT fan-out list in one
        # expression instead of n_replicates element-wise F.lit py4j
        # calls (~0.6 ms each) at every plan construction (r14)
        F.explode(
            F.sequence(F.lit(0), F.lit(n_replicates - 1))
        ).alias("__r"),
    )
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("__r").cast("string"),
                        F.col("__id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    w = sum(
        (b >= F.lit(t)).cast("int") for t in _LADDER
    )  # Poisson(1) weight 0..7, pure integer comparisons
    means = (
        rep.withColumn("__w", w)
        .groupBy(*gcols, "__r")
        .agg(
            F.sum("__w").alias("__sw"),
            F.sum(
                (F.col("__w").cast("decimal(38,0)") * F.col("__q"))
            ).alias("__swx"),
        )
        .where(F.col("__sw") > 0)
        .select(
            *gcols,
            (
                F.col("__swx").cast("double")
                / F.lit(float(ticks))
                / F.col("__sw").cast("double")
            ).alias("__m"),
        )
    )
    lo, hi = alpha / 2, 1 - alpha / 2
    ci = means.groupBy(*gcols).agg(
        F.bround(F.expr(f"percentile(__m, {lo})"), 6).alias("ci_lo"),
        F.bround(F.expr(f"percentile(__m, {hi})"), 6).alias("ci_hi"),
    )
    on = gcols if gcols else None
    if on:
        return point.join(ci, on=on)
    return point.crossJoin(ci)
