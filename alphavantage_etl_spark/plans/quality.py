"""Data-quality expectations over a frame — the validation gate a pipeline
runs BEFORE publishing a table (Deequ/Great-Expectations shape, re-expressed
as plain aggregates).

The reference trusts its source blindly (av_etl.py appends whatever the API
returned); at 100 TB a malformed day of data poisons every consumer, so the
publish step wants machine-checkable expectations with a single cheap pass:

- all ROW-LEVEL checks (completeness, ranges, regex conformance) compile
  into ONE ``agg`` over the frame — one scan, map-side partial, no matter
  how many checks;
- set-level checks need their own shape and say so: uniqueness is one
  groupBy on the key columns, referential integrity one anti-join per
  dimension (broadcast-eligible — dims are small).

``run_checks`` returns a plain dict report (check -> observed, threshold,
ok); ``enforce`` raises on the first failure with the full report attached
— callers decide whether a violation blocks the append or just alerts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Checks:
    """Declarative expectation set. Row-level lists compile to one agg."""

    complete: list[str] = field(default_factory=list)  # cols with no NULLs
    min_completeness: float = 1.0
    ranges: list[tuple[str, float, float]] = field(default_factory=list)
    patterns: list[tuple[str, str]] = field(default_factory=list)  # rlike
    unique: list[list[str]] = field(default_factory=list)  # key col sets
    references: list[tuple[str, DataFrame, str]] = field(
        default_factory=list
    )  # (fk col, dim frame, dim key)


def _row_aggs(checks: Checks) -> list:
    """The row-level expectations as one aggregate-expression list —
    shared by the batch gate (one agg job) and the streaming observer
    (df.observe piggybacks them on the micro-batch, zero extra scans)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in checks.complete:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
    for c, lo, hi in checks.ranges:
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
                    1,
                ).otherwise(0)
            ).alias(f"oob_{c}")
        )
    for c, pat in checks.patterns:
        aggs.append(
            F.sum(
                F.when(F.col(c).isNotNull() & ~F.col(c).rlike(pat), 1).otherwise(0)
            ).alias(f"re_{c}")
        )
    return aggs


def observe_quality(
    df: DataFrame, checks: Checks, name: str = "quality"
) -> DataFrame:
    """Attach the ROW-LEVEL expectations to a streaming (or batch) frame
    via ``df.observe`` — each micro-batch reports the same metrics the
    batch gate computes, in ``StreamingQueryProgress.observedMetrics``,
    with ZERO extra scans (the observer rides the existing plan).
    Set-level checks (uniqueness, referential) need their own shuffles
    and stay batch-side — run the batch gate over the sink periodically.
    """
    return df.observe(name, *_row_aggs(checks))


def report_from_metrics(metrics, checks: Checks) -> dict:
    """Turn one observed-metrics row (a Row from
    ``progress.observedMetrics['<name>']``) into the same report dict
    ``run_checks`` produces for row-level checks."""
    return _row_report(metrics, checks)


def run_checks(df: DataFrame, checks: Checks) -> dict:
    row = df.agg(*_row_aggs(checks)).collect()[0]
    report = _row_report(row, checks)
    report.update(_set_checks(df, checks))
    return report


def _row_report(row, checks: Checks) -> dict:
    report: dict[str, dict] = {}
    n = row["__n"]
    for c in checks.complete:
        frac = (row[f"nn_{c}"] / n) if n else 1.0
        report[f"complete:{c}"] = {
            "observed": frac,
            "threshold": checks.min_completeness,
            "ok": frac >= checks.min_completeness,
        }
    for c, lo, hi in checks.ranges:
        bad = int(row[f"oob_{c}"])
        report[f"range:{c}[{lo},{hi}]"] = {
            "observed": bad, "threshold": 0, "ok": bad == 0,
        }
    for c, pat in checks.patterns:
        bad = int(row[f"re_{c}"])
        report[f"pattern:{c}"] = {"observed": bad, "threshold": 0, "ok": bad == 0}
    report["__rows"] = {"observed": int(n), "threshold": None, "ok": True}
    return report


def _set_checks(df: DataFrame, checks: Checks) -> dict:
    report: dict[str, dict] = {}
    for key_cols in checks.unique:
        dups = (
            df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .count()
        )
        report[f"unique:{','.join(key_cols)}"] = {
            "observed": int(dups), "threshold": 0, "ok": dups == 0,
        }
    for fk, dim, dim_key in checks.references:
        orphans = (
            df.select(F.col(fk))
            .where(F.col(fk).isNotNull())
            .join(dim.select(F.col(dim_key).alias(fk)), fk, "left_anti")
            .count()
        )
        report[f"ref:{fk}->{dim_key}"] = {
            "observed": int(orphans), "threshold": 0, "ok": orphans == 0,
        }
    return report


class QualityCheckError(AssertionError):
    def __init__(self, failures: list[str], report: dict):
        super().__init__(f"data-quality checks failed: {failures}")
        self.failures = failures
        self.report = report


def enforce(report: dict) -> dict:
    """Raise ``QualityCheckError`` when any check failed; returns the
    report unchanged otherwise so it chains into logging/manifests."""
    failures = [k for k, v in report.items() if not v["ok"]]
    if failures:
        raise QualityCheckError(failures, report)
    return report


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — the dataset-card / schema-drift profile a
    pipeline records next to every published table.

    Scale design (100 TB): ALL columns profile in ONE aggregation over
    ONE scan (plan-pinned): null counts and min/max are plain partial
    aggregates; the multi-column exact distinct counts compile to
    Spark's Expand strategy (one scan fans each row into per-distinct
    streams — CPU ~ |cols| x rows, I/O 1x). min/max compute in the
    column's NATIVE ordering and cast to string only for the uniform
    report schema (so 9 < 10 for ints, while a string column keeps its
    lexicographic truth). Swap `approx_count_distinct` for the exact
    distinct at extreme widths — same one-row shape, the HLL trade.
    """
    cols = list(df.columns) if cols is None else list(cols)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
        F.col("__n").cast("long").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def corpus_digest(df, cols: list[str]):
    """One-row (n_rows, n_distinct, digest): an ORDER-INDEPENDENT exact
    content digest of the selected columns — the dataset version id a
    pipeline caches on ("did the input actually change?") and the cheap
    cross-environment equality probe (two corpora with equal digests,
    row counts and distinct counts are content-identical up to 64-bit
    collision odds; unequal digests are PROOF of difference).

    digest = exact decimal sum over rows of the first-48-bit integer of
    ``md5(col1 || 0x1f || col2 ...)`` (12 hex chars — safely inside a
    signed 64-bit parse on every engine, unlike the full 64 bits) —
    md5 (not xxhash64) so ANY
    engine or a plain Python script reproduces it; summation is
    commutative, so the digest is independent of row order,
    partitioning and merge order by construction (no sort needed,
    unlike a hash-of-sorted-concat). NULLs encode as an explicit
    sentinel distinct from empty strings.

    Scale: one projection + one all-collapsing aggregation — map-side
    partials carry three numbers per task.
    """
    from pyspark.sql import functions as F

    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in cols
        ],
    )
    h48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.select(
        canon.alias("__c"), h48.alias("__h")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("__c").alias("n_distinct"),
        F.sum("__h").cast("decimal(38,0)").cast("string").alias("digest"),
    )

def profile_diff(
    old: DataFrame,
    new: DataFrame,
    cols: list[str] | None = None,
    null_shift_bar: float = 0.01,
    distinct_ratio_band: tuple = (0.5, 2.0),
) -> DataFrame:
    """(column, old/new n_rows·n_null·n_distinct·min·max, null_rate_shift,
    distinct_ratio, range_changed, drift_flag): the snapshot-over-
    snapshot schema/statistics drift report — run profile_table on both
    snapshots (each ONE scan) and join per column. ``drift_flag`` fires
    when the null rate moved more than ``null_shift_bar``, the distinct
    count moved outside ``distinct_ratio_band``, or the value range
    changed — the pre-publish gate that catches a silently truncated
    load or an upstream type regression before a consumer does.

    Rates and ratios are exact-int double divisions (unrounded, pure
    rational); everything downstream of the two profiles is |cols|-row
    arithmetic.
    """
    po = profile_table(old, cols)
    pn = profile_table(new, cols)
    o = po.select(
        "column",
        F.col("n_rows").alias("old_rows"),
        F.col("n_null").alias("old_null"),
        F.col("n_distinct").alias("old_distinct"),
        F.col("min_value").alias("old_min"),
        F.col("max_value").alias("old_max"),
    )
    n = pn.select(
        "column",
        F.col("n_rows").alias("new_rows"),
        F.col("n_null").alias("new_null"),
        F.col("n_distinct").alias("new_distinct"),
        F.col("min_value").alias("new_min"),
        F.col("max_value").alias("new_max"),
    )
    j = o.join(n, "column")
    null_rate = lambda nl, nr: F.when(  # noqa: E731
        F.col(nr) > 0, F.col(nl).cast("double") / F.col(nr).cast("double")
    ).otherwise(F.lit(0.0))
    shift = null_rate("new_null", "new_rows") - null_rate(
        "old_null", "old_rows"
    )
    dratio = F.when(
        F.col("old_distinct") > 0,
        F.col("new_distinct").cast("double")
        / F.col("old_distinct").cast("double"),
    )
    range_changed = (
        ~F.col("new_min").eqNullSafe(F.col("old_min"))
    ) | (~F.col("new_max").eqNullSafe(F.col("old_max")))
    lo, hi = distinct_ratio_band
    flag = (
        (F.abs(shift) > F.lit(null_shift_bar))
        | F.coalesce(
            (dratio < F.lit(lo)) | (dratio > F.lit(hi)), F.lit(True)
        )
        | range_changed
    )
    return j.select(
        "column",
        "old_rows",
        "new_rows",
        "old_null",
        "new_null",
        "old_distinct",
        "new_distinct",
        "old_min",
        "new_min",
        "old_max",
        "new_max",
        shift.alias("null_rate_shift"),
        dratio.alias("distinct_ratio"),
        range_changed.alias("range_changed"),
        flag.alias("drift_flag"),
    )


def shard_balance(
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_shards: int = 32,
    salt: str = "shard",
) -> DataFrame:
    """One row (n_shards, n_rows, total_tokens, mean_tokens, cv,
    max_over_mean, chi2): the balance audit of a content-addressed
    shard assignment — "will shard 17 finish an epoch 3x after the
    others" — run BEFORE a training job burns a cluster on a skewed
    layout. Shards are ``md5(salt ':' id) mod n_shards`` (the
    engine-portable split_bucket hash, reproducible by any downstream
    consumer), sizes are the per-row token counts.

    cv = sigma/mean of per-shard token totals (bround 1e-9, the one
    transcendental); max_over_mean and chi2 (= (S*sum(o^2) -
    total^2)/total over all S cells, empty shards included via the
    sum-of-squares form) are exact-integer double ratios, unrounded.
    NULL ids / sizes are excluded.

    Scale: one hash aggregation onto the S-row shard table, one S-row
    final aggregate — no windows, no joins; S is a config constant.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from ..operators.sampling import split_bucket

    # NULL ids must be excluded BEFORE hashing (ADVICE r7): concat_ws
    # inside split_bucket silently drops a NULL id, so Spark would hash
    # the bare salt into a real bucket while a SQL oracle's concat
    # yields a NULL bucket — a phantom cell and engine divergence.
    base = (
        df.where(F.col(id_col).isNotNull())
        .select(
            split_bucket(id_col, salt=salt, buckets=n_shards),
            F.col(size_col).cast("long").alias("sz"),
        )
        .where(F.col("sz").isNotNull())
    )
    per = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sz").alias("o"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = per.agg(
        F.sum("n").alias("n_rows"),
        F.sum(dec(F.col("o"))).alias("__tot"),
        F.sum(dec(F.col("o")) * dec(F.col("o"))).alias("__o2"),
        F.max("o").alias("__mx"),
    )
    S = F.lit(float(n_shards))
    tot = F.col("__tot").cast("double")
    mean = tot / S
    var = F.col("__o2").cast("double") / S - mean * mean
    return s.select(
        F.lit(n_shards).cast("long").alias("n_shards"),
        "n_rows",
        F.col("__tot").cast("long").alias("total_tokens"),
        mean.alias("mean_tokens"),
        F.when(
            tot > 0, F.bround(F.sqrt(F.greatest(var, F.lit(0.0))) / mean, 9)
        ).alias("cv"),
        F.when(tot > 0, F.col("__mx").cast("double") / mean).alias(
            "max_over_mean"
        ),
        F.when(
            tot > 0,
            (
                S * F.col("__o2").cast("double") - tot * tot
            )
            / tot,
        ).alias("chi2"),
    )
