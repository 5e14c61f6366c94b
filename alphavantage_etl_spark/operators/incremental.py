"""Incremental (watermark / anti-join) ingest — SURVEY.md sections 2.3 J2, 2.9 ST1/ST2.

The reference's incremental protocol: read the sink's max date
(av_etl.py:12-19), compute the gap, fetch, then keep only "new" rows with a
**positional** ``df.tail(gap)`` (av_etl.py:79,126,130) — correct only while
API row order matches the DB watermark, with the primary key as a crash-loud
backstop (av_etl.py:37-38). The relationally robust form is a key-based
anti-join / watermark predicate; unit tests pin the equivalence.

Scale: the anti-join's build side is ``existing.select(key)`` — for a
date-keyed sink that's one row per day (broadcastable forever). The
watermark-predicate form is even cheaper: a pushed-down scan filter that
prunes partitions at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def high_watermark(existing: DataFrame, key: str):
    """Max key in the sink — the reference's ``get_recent_row_date``
    (av_etl.py:12-19: ``ORDER BY date DESC LIMIT 1``), expressed as an
    aggregate so it needs no global sort."""
    return existing.agg(F.max(key).alias("wm")).first()["wm"]


def new_rows(incoming: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing``
    (av_etl.py:79's ``tail(gap)``, made order-independent).

    ``left_anti`` on the deduplicated key projection; Catalyst broadcasts
    the key set when small (check: BroadcastHashJoin ... LeftAnti in the
    plan)."""
    keys = existing.select(key).dropDuplicates([key])
    return incoming.join(F.broadcast(keys), key, "left_anti")


def merge_incremental(incoming: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Sink-after-append contents: existing plus genuinely-new incoming rows.

    Batch analog of the reference's append step (av_etl.py:30-36) with the
    PK-violation path (av_etl.py:38) designed out: duplicates are removed
    by construction, so the append never needs to fail."""
    return existing.unionByName(new_rows(incoming, existing, key))
