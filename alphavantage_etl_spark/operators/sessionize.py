"""Sessionization (X6) — gap-based event sessions per user.

Batch implementation uses Spark's native ``session_window`` (the same
operator Structured Streaming uses for stateful session aggregation, so the
batch and streaming plans share semantics). A session groups a user's events
whose inter-event gap is < ``gap``; ``session_window.end`` is last-event +
gap, so the aggregated ``last_ts`` is taken from the events themselves.

Scale: one shuffle on the partition key (user_id); state per key is bounded
by the session merge, and the streaming variant bounds it further with a
watermark (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """One row per (user, session): start/last timestamps, event count, value sum.

    Boundary semantics (verified empirically, pinned in tests): an event
    exactly ``gap`` after its predecessor is MERGED into the same session —
    session_window's merge condition is inclusive. The islands/lag oracle
    formulation must therefore split only on ``diff > gap``, not ``>=``.
    """
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .drop("session_window")
    )
