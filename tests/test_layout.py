"""Storage-layout evidence: partition pruning and shuffle-free bucketed
joins must be visible in the executed plan, not just claimed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.plans.views import px_bars
from alphavantage_etl_spark.sources import load
from alphavantage_etl_spark.sources.layout import (
    co_located_join,
    write_bucketed,
    write_partitioned,
)

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "px_by_year")
    px = px_bars(spark, SF_SMALL).withColumn("year", F.year("date"))
    write_partitioned(px, path, "year")

    back = spark.read.parquet(path).where(F.col("year") == 1997)
    plan = _plan(back)
    assert "PartitionFilters" in plan and "1997" in plan
    # pruned scan reads only the matching partition's rows
    want = px.where(F.col("year") == 1997).count()
    assert back.count() == want > 0


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in the session's static warehouse dir
    # (./spark-warehouse); dropped + removed in the finally block
    o = load(spark, SF_SMALL, "orders")
    li = load(spark, SF_SMALL, "lineitem")
    # At fixture scale the planner prefers broadcasting the small side
    # (which bypasses bucketing entirely); disable broadcast to surface the
    # co-located sort-merge path this test is about.
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "orderkey"),
            "t_orders_b", "orderkey", n_buckets=4, sort_col="orderkey",
        )
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "orderkey"),
            "t_lineitem_b", "orderkey", n_buckets=4, sort_col="orderkey",
        )
        j = co_located_join(spark, "t_lineitem_b", "t_orders_b", on="orderkey").select(
            "orderkey", "o_custkey", "l_extendedprice"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:2000]}"
        # row parity with the plain (shuffling) join
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
