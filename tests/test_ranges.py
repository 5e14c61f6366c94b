"""Interval-join semantics: containment, inclusive boundaries, multi-bucket
spans, key scoping, and the bucketized-equi plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.ranges import interval_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", ts(9, 30)),   # inside iv A
            (2, "u1", ts(10, 0)),   # exactly at A's end -> inclusive
            (3, "u1", ts(10, 1)),   # after A, before B
            (4, "u1", ts(23, 45)),  # inside B (which spans many buckets)
            (5, "u2", ts(9, 30)),   # same time as p1 but other key
        ],
        "event_id long, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "A", ts(9, 0), ts(10, 0)),
            ("u1", "B", ts(11, 0), ts(23, 59)),
            ("u2", "C", ts(9, 0), ts(9, 59)),
        ],
        "user string, iv string, start timestamp, fin timestamp",
    )
    return points, intervals


def test_containment_and_inclusive_bounds(spark, frames):
    points, intervals = frames
    out = {
        (r["event_id"], r["iv"])
        for r in interval_join(
            points, intervals, "ts", "start", "fin", keys=["user"]
        ).collect()
    }
    assert out == {(1, "A"), (2, "A"), (4, "B"), (5, "C")}


def test_multi_bucket_span_matches_once(spark, frames):
    points, intervals = frames
    out = interval_join(points, intervals, "ts", "start", "fin", keys=["user"])
    # interval B spans 13 hourly buckets; point 4 must match exactly once
    assert out.where(F.col("event_id") == 4).count() == 1


def test_without_keys_joins_across_keys(spark, frames):
    points, intervals = frames
    out = interval_join(
        points.drop("user"), intervals.drop("user"), "ts", "start", "fin"
    )
    # p1/p5 (same ts) now match both A and C
    assert out.where(F.col("event_id") == 1).count() == 2


def test_column_collision_raises(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="both"):
        interval_join(
            points.withColumnRenamed("ts", "start"),
            intervals, "start", "start", "fin",
        )


def test_bad_bucket_raises(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="bucket"):
        interval_join(
            points, intervals, "ts", "start", "fin",
            keys=["user"], bucket="fortnight",
        )


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    points, intervals = frames
    plan = (
        interval_join(points, intervals, "ts", "start", "fin", keys=["user"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # without the operator, a keyless BETWEEN predicate degenerates to a
    # nested-loop join (the thing the bucketization exists to avoid); with
    # an equi key it becomes a sort-merge join whose range residual is
    # quadratic within each key group — the bucketized form is equi on
    # (bucket, key) so the residual filter only sees same-bucket rows
    naive = (
        points.drop("user")
        .join(
            intervals.drop("user"),
            points["ts"].between(intervals["start"], intervals["fin"]),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" in naive or "CartesianProduct" in naive


def test_inverted_interval_matches_nothing(spark, frames):
    points, _ = frames
    bad = spark.createDataFrame(
        [("u1", "X", ts(12, 0), ts(9, 0))],  # end < start
        "user string, iv string, start timestamp, fin timestamp",
    )
    out = interval_join(points, bad, "ts", "start", "fin", keys=["user"])
    assert out.count() == 0  # BETWEEN semantics, not a sequence() crash


def test_long_interval_routes_to_broadcast_not_explode(spark, frames):
    """A pathological interval (years-long at an hourly bucket) must NOT
    explode into thousands of bucket rows — the max_fanout guard routes it
    through the broadcast BETWEEN path, result identical to naive BETWEEN."""
    points, intervals = frames
    long_iv = spark.createDataFrame(
        # sentinel "never closed" session: ~2 years at bucket=hour
        [("u1", "LONG", dt.datetime(2023, 1, 1), dt.datetime(2024, 12, 31))],
        "user string, iv string, start timestamp, fin timestamp",
    )
    both = intervals.unionByName(long_iv)
    out = interval_join(
        points, both, "ts", "start", "fin", keys=["user"], max_fanout=64
    )
    got = {(r["event_id"], r["iv"]) for r in out.collect()}
    # every u1 point falls inside LONG; short-path matches unchanged
    assert got == {
        (1, "A"), (2, "A"), (4, "B"), (5, "C"),
        (1, "LONG"), (2, "LONG"), (3, "LONG"), (4, "LONG"),
    }


def test_max_fanout_caps_exploded_rows(spark, frames):
    """The exploded (equi-join) side must never carry more bucket rows per
    interval than max_fanout, no matter the interval span."""
    _, intervals = frames
    long_iv = spark.createDataFrame(
        [("u1", "LONG", dt.datetime(2023, 1, 1), dt.datetime(2024, 12, 31))],
        "user string, iv string, start timestamp, fin timestamp",
    )
    both = intervals.unionByName(long_iv)
    fan = F.expr(
        "timestampdiff(hour, date_trunc('hour', start),"
        " date_trunc('hour', fin))"
    )
    exploded_rows = (
        both.where(F.col("start") <= F.col("fin"))
        .where(fan + 1 <= 64)
        .select(F.sum(fan + 1))
        .collect()[0][0]
    )
    assert exploded_rows < 64 * 3  # only the 3 short intervals explode
    # sanity: without the guard the LONG interval alone would be ~17.5k rows
    total = (
        both.where(F.col("start") <= F.col("fin"))
        .select(F.sum(fan + 1))
        .collect()[0][0]
    )
    assert total > 17_000


def test_exactly_once_across_both_paths(spark, frames):
    """No (point, interval) pair may appear twice when both the bucketized
    and the broadcast path are active in one join."""
    points, intervals = frames
    long_iv = spark.createDataFrame(
        [("u1", "LONG", dt.datetime(2023, 1, 1), dt.datetime(2024, 12, 31))],
        "user string, iv string, start timestamp, fin timestamp",
    )
    both = intervals.unionByName(long_iv)
    out = interval_join(
        points, both, "ts", "start", "fin", keys=["user"], max_fanout=64
    )
    dup = (
        out.groupBy("event_id", "iv").count().where(F.col("count") > 1).count()
    )
    assert dup == 0
