"""Change history operators: SCD Type-2 interval build and dataset diff.

Reference scope: the reference's incremental refresh (av_etl.py:89-108)
keeps only the LATEST state of each series row; production warehouses also
need the history form — when did each value start and stop being true —
and an audit of what changed between two dataset versions. Both are pure
relational compositions (windows + one full-outer join), so Catalyst owns
the physical strategy.

Scale design (100 TB):
- ``scd2_build`` is two window passes over the same (key) partitioning —
  one Exchange total, AQE-coalesced; no UDF, no self-join. Change
  compression (dropping rows whose tracked values equal the previous row)
  happens BEFORE interval assembly, so the second window reads the
  already-reduced stream.
- ``dataset_diff`` is one full-outer equi-join on the primary key; both
  sides shuffle once on the key (or broadcast, if one version is a small
  delta — left to AQE). The per-row status is a projection; callers
  aggregate for a summary or filter ``status != 'unchanged'`` for an
  audit log, and that filter prunes before anything else is computed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD Type-2 validity intervals.

    For each key, ordered by (ts, tiebreak), consecutive rows carrying the
    same tracked values are compressed into one; each surviving row
    becomes a version with ``valid_from`` = its own timestamp,
    ``valid_to`` = the next version's timestamp (NULL for the current
    version), and ``is_current``. Intervals are half-open
    [valid_from, valid_to) — the same convention as the busday calendar.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    same = None
    for c in value_cols:
        eq = F.col(c).eqNullSafe(F.lag(c).over(w))
        same = eq if same is None else (same & eq)
    # eqNullSafe(NULL, NULL) is TRUE, so a key's first row with NULL
    # tracked values would read as "same as the (nonexistent) previous
    # row" — the explicit first-row guard keeps it.
    first = F.row_number().over(w) == 1
    compressed = (
        changes.withColumn("_dup", ~first & same)
        .filter(~F.col("_dup"))
        .drop("_dup")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return compressed.select(
        key_col,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two versions of a keyed dataset.

    Returns one row per key present in either version with
    ``status`` in {added, removed, changed, unchanged} and the old/new
    values of each compared column (``<col>_old`` / ``<col>_new``).
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *key_cols,
        status.alias("status"),
        *[f"{c}_old" for c in compare_cols],
        *[f"{c}_new" for c in compare_cols],
    )


def scd2_lookup(
    points: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension (the feature-store
    correctness primitive): each point row joins the dimension version
    whose half-open [valid_from, valid_to) interval contains its
    timestamp — training examples see exactly the state that was true at
    event time, never a later version (no feature leakage).

    Reuses `operators.ranges.interval_join` (bucketized equi-join, long-
    interval fan-out guard). Open current versions (valid_to NULL) are
    capped IN-PLAN at the points' max timestamp + 1 day — bounding every
    interval's bucket span by the observed data range, so open versions
    never trip the guard's broadcast fallback at scale. Half-open
    semantics come from shifting the inclusive BETWEEN end by one
    microsecond (the engine's timestamp precision): an event exactly at
    a version boundary belongs to the NEW version.
    """
    from .ranges import interval_join

    max_ts = points.agg(F.max(ts_col).alias("__maxts"))
    capped = (
        dim.crossJoin(F.broadcast(max_ts))
        .withColumn(
            "__end",
            F.coalesce(
                F.col("valid_to"),
                F.col("__maxts") + F.expr("INTERVAL 1 DAY"),
            )
            - F.expr("INTERVAL 1 MICROSECOND"),
        )
        .drop("valid_to", "is_current", "__maxts")
    )
    return interval_join(
        points,
        capped,
        ts_col,
        "valid_from",
        "__end",
        keys=[key_col],
        bucket="day",
    ).drop("valid_from", "__end")


def join_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """One-row frame profiling a prospective equi-join BEFORE running it:
    (n_left, n_right, n_keys_left, n_keys_right, n_keys_shared,
    orphans_left, orphans_right, max_fanout_left, max_fanout_right,
    est_join_rows) — the planning readout that catches the two join
    killers early: silent row loss (orphans on the fact side mean a
    broken dimension) and fan-out explosions (a hot key whose
    |L_k| x |R_k| product owns the output).

    ``est_join_rows`` is EXACT, not an estimate: sum over shared keys of
    the per-side count product — what the inner join would emit. NULL
    keys never join (SQL semantics) and are excluded from key counts;
    orphans_* counts ROWS (not keys) whose key finds no partner,
    including NULL-keyed rows.

    Scale design (100 TB): one per-key count aggregation PER SIDE
    (map-side combine), then every statistic derives from the two
    KEY-BOUNDED count tables (full-outer joined once) — the data is
    scanned once per side and never joined. Products in decimal(38,0)
    (two hot keys at 1e10 rows overflow a long).
    """
    lk = (
        left.select(F.col(left_key).alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__cl"))
    )
    rk = (
        right.select(F.col(right_key).alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__cr"))
    )
    m = lk.join(rk, on="__k", how="full")
    keyed = F.col("__k").isNotNull()
    both = keyed & F.col("__cl").isNotNull() & F.col("__cr").isNotNull()
    return m.agg(
        F.coalesce(F.sum("__cl"), F.lit(0)).cast("long").alias("n_left"),
        F.coalesce(F.sum("__cr"), F.lit(0)).cast("long").alias("n_right"),
        F.count(F.when(keyed & F.col("__cl").isNotNull(), 1)).alias(
            "n_keys_left"
        ),
        F.count(F.when(keyed & F.col("__cr").isNotNull(), 1)).alias(
            "n_keys_right"
        ),
        F.count(F.when(both, 1)).alias("n_keys_shared"),
        F.coalesce(
            F.sum(F.when(~both, F.col("__cl"))), F.lit(0)
        ).cast("long").alias("orphans_left"),
        F.coalesce(
            F.sum(F.when(~both, F.col("__cr"))), F.lit(0)
        ).cast("long").alias("orphans_right"),
        F.coalesce(
            F.max(F.when(both, F.col("__cl"))), F.lit(0)
        ).cast("long").alias("max_fanout_left"),
        F.coalesce(
            F.max(F.when(both, F.col("__cr"))), F.lit(0)
        ).cast("long").alias("max_fanout_right"),
        F.coalesce(
            F.sum(
                F.when(
                    both,
                    F.col("__cl").cast("decimal(38,0)")
                    * F.col("__cr").cast("decimal(38,0)"),
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).cast("decimal(38,0)").cast("string").alias("est_join_rows"),
    )
