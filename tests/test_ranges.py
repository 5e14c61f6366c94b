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
