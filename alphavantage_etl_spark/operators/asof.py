"""As-of (most-recent-value) join — SURVEY.md section 2.3's latent J3.

The reference joins price to FX of the same day (av_etl.py:190) and then
drops misses (``dropna``, :191) — silently losing price dates whose FX row
is absent. The correct generalization is an as-of join: each left row picks
the most recent right value with ``right.on <= left.on``.

Spark has no builtin as-of join; the scalable formulation used here is the
union + last(ignorenulls) window ("piggyback" pattern, also how Flink/
QuestDB express it over sorted streams):

    1. tag left (1) and right (0) rows, union by the ordering key;
    2. window ordered by (on, tag): ``last(value, ignorenulls=True)`` over
       rowsBetween(unboundedPreceding, 0) — right rows sort before left rows
       at the same key, so a same-day right value IS visible (inclusive);
    3. keep left rows.

    Cost: ONE shuffle/sort of |L|+|R| — versus a range-join which Spark
    plans as O(|L|x|R|) BroadcastNestedLoop. With ``partition_by`` (e.g.
    symbol), the sort parallelizes per key and never sees a global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    partition_by: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every ``left`` row + latest ``right`` values at or
    before its ``on`` key. Right payload columns keep their names (plus
    optional suffix). Left rows before the first right row get NULLs.

    Precondition: ``right`` has at most one row per (partition_by, on) —
    with duplicates the tie between same-key right rows is not ordered and
    the filled value is nondeterministic. Deduplicate (e.g. ``max_by`` per
    key) first; the reference's FX table satisfies this via its date PK.
    """
    payload = [c for c in right.columns if c != on and c not in (partition_by or [])]
    lcols = [c for c in left.columns]
    clashes = {f"{c}{suffix}" for c in payload} & set(lcols)
    if clashes:
        raise ValueError(
            f"right payload column(s) {sorted(clashes)} collide with left "
            "columns in the output; pass a non-empty suffix (e.g. "
            "suffix='_r') or rename before joining"
        )

    tagged_r = right.select(
        *[F.col(c) for c in (partition_by or [])],
        F.col(on),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    tagged_l = left.select(
        *[F.col(c) for c in (partition_by or [])],
        F.col(on),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in payload],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c != on and c not in (partition_by or [])],
    )
    # align schemas: right side lacks the left payload columns
    for c in lcols:
        if c != on and c not in (partition_by or []):
            tagged_r = tagged_r.withColumn(f"__l_{c}", F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = tagged_r.unionByName(tagged_l)
    w = (
        (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy())
        .orderBy(on, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in payload],
    )
    out = filled.where(F.col("__tag") == 1).select(
        *[F.col(c) for c in (partition_by or [])],
        F.col(on),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c != on and c not in (partition_by or [])],
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in payload],
    )
    return out
