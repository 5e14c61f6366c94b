"""Salted join / two-stage aggregation: results must be row-identical to
the unsalted forms (salting only changes partitioning), salt assignment
must be deterministic across reruns, and hot keys must actually spread."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 90% of rows
    rows = [("hot", i, float(i)) for i in range(900)]
    rows += [(f"k{i % 10}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, i long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(10)],
        "k string, label string",
    )


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").select("k", "i", "v", "label")
    salted = salted_join(skewed, dim, "k", salt=8).select("k", "i", "v", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed, dim):
    extra = skewed.union(spark.createDataFrame([("orphan", 1, 1.0)], skewed.schema))
    out = salted_join(extra, dim, "k", salt=4, how="left")
    orphan = out.where(F.col("k") == "orphan").collect()
    assert len(orphan) == 1 and orphan[0]["label"] is None


def test_salt_spreads_hot_key_and_is_deterministic(spark, skewed):
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64("i", "v"), F.lit(8))
    )
    counts = [
        r["count"]
        for r in salted.where(F.col("k") == "hot").groupBy("__salt").count().collect()
    ]
    assert len(counts) == 8, "hot key must occupy every salt shard"
    assert max(counts) < 900 * 0.3, f"shards too uneven: {counts}"
    again = [
        tuple(r)
        for r in salted.select("k", "i", "__salt").orderBy("i", "k").collect()
    ]
    once = [
        tuple(r)
        for r in skewed.withColumn(
            "__salt", F.pmod(F.xxhash64("i", "v"), F.lit(8))
        ).select("k", "i", "__salt").orderBy("i", "k").collect()
    ]
    assert again == once, "salt must be deterministic, never rand()"


def test_salted_agg_matches_plain_agg(spark, skewed):
    plain = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    two_stage = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "n": ("count", F.lit(1)), "s": ("sum", F.col("v")),
                "mn": ("min", F.col("v")), "mx": ("max", F.col("v")),
            },
            salt=8,
        ).collect()
    }
    assert set(plain) == set(two_stage)
    for k in plain:
        assert plain[k][0] == two_stage[k][0]
        assert plain[k][1] == pytest.approx(two_stage[k][1])
        assert plain[k][2:] == two_stage[k][2:]


def test_salted_agg_rejects_non_mergeable(spark, skewed):
    with pytest.raises(ValueError, match="sum.*count.*min.*max"):
        salted_agg(skewed, ["k"], {"a": ("avg", F.col("v"))}, salt=4)
    with pytest.raises(ValueError, match="sum.*count.*min.*max"):
        salted_agg(skewed, ["k"], {"a": F.avg("v")}, salt=4)  # legacy Column form
