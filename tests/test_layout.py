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


# ---- plan-shape pins for the round-2 operators: the scale claims in their
# docstrings (shuffle counts, broadcast sides) must hold in the optimized
# plan, not just the prose.


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_split_assign_plan_is_shuffle_free(spark):
    from alphavantage_etl_spark.operators.sampling import hash_split

    d = load(spark, SF_SMALL, "documents").select("doc_id")
    plan = _plan(hash_split(d, "doc_id", {"a": 0.5, "b": 0.5}))
    assert "Exchange" not in plan


def test_stratified_sample_plan_is_shuffle_free(spark):
    from alphavantage_etl_spark.operators.sampling import stratified_sample

    d = load(spark, SF_SMALL, "documents").select("doc_id", "source")
    plan = _plan(stratified_sample(d, "source", "doc_id", {"src0": 0.5}))
    assert "Exchange" not in plan


def test_quota_and_pack_have_single_exchange(spark):
    from alphavantage_etl_spark.operators.sampling import group_quota, pack_bins

    d = load(spark, SF_SMALL, "documents").select("doc_id", "source")
    sized = d.withColumn("n", F.length(F.lit("x")).cast("long"))
    for out in (
        group_quota(d, "source", [F.col("doc_id")], n=3),
        pack_bins(sized, "source", "doc_id", "n", budget=10),
    ):
        plan = _plan(out)
        assert plan.count("Exchange") == 1, plan


def test_contamination_benchmark_side_broadcasts(spark):
    from alphavantage_etl_spark.operators.contamination import ngram_contamination

    d = load(spark, SF_SMALL, "documents")
    bench = d.where(F.col("doc_id") % 47 == 0)
    corp = d.where(F.col("doc_id") % 47 != 0)
    plan = _plan(ngram_contamination(corp, bench, "text", "doc_id", k=8))
    assert "BroadcastHashJoin" in plan
    # exactly one data shuffle: the (doc, bench) partial-agg counts
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_contamination_oversized_bench_not_force_broadcast(spark):
    """An oversized benchmark side must NOT get a forced broadcast hint —
    with the hint absent (and auto-broadcast off to emulate a too-big
    side), Catalyst plans a shuffle join instead of a driver-OOM
    broadcast; AQE remains free to upgrade at runtime."""
    from alphavantage_etl_spark.operators.contamination import ngram_contamination

    d = load(spark, SF_SMALL, "documents")
    bench = d.where(F.col("doc_id") % 47 == 0)
    corp = d.where(F.col("doc_id") % 47 != 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # broadcast_max_bytes=0: every size estimate is "too big"
        plan = _plan(
            ngram_contamination(
                corp, bench, "text", "doc_id", k=8, broadcast_max_bytes=0
            )
        )
        assert "BroadcastHashJoin" not in plan, plan
        # forcing stays available for known-small suites
        forced = _plan(
            ngram_contamination(
                corp, bench, "text", "doc_id", k=8, broadcast_bench=True
            )
        )
        assert "BroadcastHashJoin" in forced, forced
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_label_centroids_single_shuffle_after_explode(spark):
    from alphavantage_etl_spark.operators.similarity import label_centroids

    emb = load(spark, SF_SMALL, "embeddings")
    plan = _plan(label_centroids(emb))
    # explode feeds a partial HashAggregate BEFORE the only Exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.index("Generate posexplode") > plan.index("Exchange"), (
        "explode must run below (after in tree order) the exchange — "
        "partial aggregation map-side, exploded rows never shuffle"
    )
