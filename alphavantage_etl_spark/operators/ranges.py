"""Interval (range-containment) join — points to the intervals containing
them, as a bucketized EQUI-join.

Spark has no native range-join optimization: a raw ``p.ts BETWEEN i.start
AND i.end`` predicate plans as BroadcastNestedLoopJoin (or a key-equi join
whose hot keys re-introduce the quadratic inside each key group). The
scale-correct shape decomposes time into fixed-width buckets:

- each interval EXPLODES into the bucket ids it overlaps
  (fan-out = span/bucket + 1 rows — bounded, tunable);
- each point computes its single bucket id — a projection;
- the join becomes an equi-join on (bucket [, keys...]) that hash-
  partitions both sides, followed by the exact containment filter.

Every true (point, interval) pair matches EXACTLY once — the point's one
bucket appears exactly once in the interval's bucket sequence — so no
post-join dedup is needed. Pick ``bucket_seconds`` near the median
interval span: too coarse packs unrelated rows into one bucket (filter
does more work), too fine inflates the interval fan-out.

Pathological fan-out guard: a single interval spanning years at an hourly
bucket would explode into tens of thousands of rows — and a handful of
such outliers (a never-closed session, a sentinel end date) can dominate
the whole shuffle. ``max_fanout`` splits the interval side by bucket
count: intervals under the cap take the bucketized equi-join; the rare
long tail is broadcast and joined with the raw BETWEEN predicate — exact
and cheap precisely BECAUSE the tail is small (the split is what keeps it
small; the cap errs on never letting one row fan out unboundedly). The
tail branch re-reads the (column-pruned) point source — no shuffle, but a
second scan; callers joining genuinely tail-heavy interval sets at scale
should persist the point projection first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_BUCKET_UNITS = ("minute", "hour", "day", "week", "month")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket: str = "hour",
    max_fanout: int | None = 1024,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= ts <= end`` (boundaries inclusive, matching SQL BETWEEN),
    optionally also requiring equality on ``keys``.

    ``max_fanout`` caps the per-interval bucket explosion: intervals whose
    span covers >= ``max_fanout`` buckets are routed through a broadcast
    BETWEEN join instead of exploding (see module docstring). ``None``
    disables the split (every interval explodes, the pre-r3 behavior).

    Buckets are ``date_trunc(bucket, ·)`` values and the interval's bucket
    list is a timestamp ``sequence`` with an ``interval 1 <bucket>`` step —
    type-preserving and timezone-free for both TIMESTAMP and
    TIMESTAMP_NTZ (an epoch-seconds formulation would force an NTZ → zone
    interpretation on the driver's session timezone).

    Non-key column names must be disjoint between the two frames (same
    contract as ``asof_join``: a silent duplicate column would poison
    downstream references — raise here instead).
    """
    keys = list(keys or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"interval_join: column(s) {sorted(overlap)} exist on both "
            "sides; rename before joining"
        )
    if bucket not in _BUCKET_UNITS:
        raise ValueError(f"bucket must be one of {_BUCKET_UNITS}, got {bucket!r}")

    p = points.withColumn("__b", F.date_trunc(bucket, F.col(ts_col)))
    # an inverted interval (end < start) matches nothing under BETWEEN —
    # drop it BEFORE the bucket sequence instead of letting sequence() kill
    # the whole job with an illegal-boundaries runtime error
    valid = intervals.where(F.col(start_col) <= F.col(end_col))

    long_tail = None
    if max_fanout is not None:
        # bucket count = timestampdiff on the TRUNCATED bounds + 1 — exactly
        # the length sequence() would produce, computed without producing it
        fan = F.expr(
            f"timestampdiff({bucket}, date_trunc('{bucket}', {start_col}),"
            f" date_trunc('{bucket}', {end_col}))"
        )
        long_tail = valid.where(fan + 1 > F.lit(max_fanout))
        valid = valid.where(fan + 1 <= F.lit(max_fanout))

    iv = valid.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(bucket, F.col(end_col)),
                F.expr(f"interval 1 {bucket}"),
            )
        ),
    )
    contained = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    out = p.join(iv, ["__b", *keys]).where(contained).drop("__b")
    if long_tail is not None:
        tail = (
            points.join(F.broadcast(long_tail), keys)
            if keys
            else points.crossJoin(F.broadcast(long_tail))
        ).where(contained)
        out = out.unionByName(tail.select(*out.columns))
    return out
