#!/usr/bin/env python3
"""10x scale slopes for the r11 additions: X136 conformed ingest
(conform_schema |> upsert_merge) and X137 ANN retrieval join.

- conformed_merge: the sf0.1 orders table replicated 10x with fresh key
  ranges (key shift a multiple of 8 preserves o_part = key % 8, so the
  partition-scoped split sees the same layout at both scales); the full
  q_conformed_merge composition (drifted wire batch -> conform ->
  partitioned merge -> per-partition fingerprint) runs on x1 vs x10.
  Linear expectation: conformance is projection; one anti-join whose
  both sides grow with the data.
- ann_join: the sf0.1 embeddings CORPUS replicated 10x (vec_id shifted
  by r * 10^7; vectors reused — ties break by id), the QUERY batch held
  FIXED at the x1 query frame (the operator contract: corpus scales,
  a query batch is a batch). Expectation: candidates = |Q| x cell_size
  grow ~10x with fixed |Q| and 10x cells population -> ~linear wall,
  far below 10x while overhead dominates at this absolute size.

Wall = full plan to collect, min of 2 warm reps, frames rebuilt per rep
(the invalid-timing trap). Prints one JSON document. Do NOT run while
any other Spark workload is running.

Usage: python scripts/r11_slope.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X1_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORDERS_X10 = "/tmp/spark_graft_scale/orders_x8x10"
EMB_X10 = "/tmp/spark_graft_scale/embeddings_x10"
REPLICAS = 10


def build_fixtures(spark):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.sources import load

    if not os.path.exists(os.path.join(ORDERS_X10, "_SUCCESS")):
        base = load(spark, X1_DIR, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        reps = None
        for r in range(REPLICAS):
            # key shift is a multiple of 8: o_part = key % 8 preserved
            shifted = base.select(
                (F.col("o_orderkey") + F.lit(r * 10_000_000)).alias(
                    "o_orderkey"
                ),
                (F.col("o_totalprice") + F.lit(float(r))).alias(
                    "o_totalprice"
                ),
                "o_orderstatus",
            )
            reps = shifted if reps is None else reps.unionByName(shifted)
        reps.write.mode("overwrite").parquet(ORDERS_X10)
    if not os.path.exists(os.path.join(EMB_X10, "_SUCCESS")):
        emb = load(spark, X1_DIR, "embeddings")
        reps = None
        for r in range(REPLICAS):
            shifted = emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                "embedding",
            )
            reps = shifted if reps is None else reps.unionByName(shifted)
        reps.write.mode("overwrite").parquet(EMB_X10)


def conformed_merge_plan(spark, orders_df):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.evolution import (
        conform_schema,
        upsert_merge,
    )

    key = F.col("o_orderkey")
    base = orders_df.select(
        "o_orderkey",
        (key % 8).cast("long").alias("o_part"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    cents = F.col("cents")
    upd = base.where(key % 7 == 0).select(
        key.cast("string").alias("order_key"),
        (key % 8).cast("string").alias("part_id"),
        F.when(key % 53 == 0, F.lit("n/a"))
        .otherwise((cents + 999).cast("string"))
        .alias("price_cents"),
        F.lit(False).alias("deleted"),
        F.lit("batch-7").alias("ingest_tag"),
    )
    ins = base.where(key % 17 == 2).select(
        (key + F.lit(200_000_000)).cast("string").alias("order_key"),
        (key % 8).cast("string").alias("part_id"),
        (key % 1000 + 1).cast("string").alias("price_cents"),
        F.lit(False).alias("deleted"),
        F.lit("batch-new").alias("ingest_tag"),
    )
    dels = base.where((key % 9 == 4) & (key % 7 != 0)).select(
        key.cast("string").alias("order_key"),
        (key % 8).cast("string").alias("part_id"),
        F.lit("0").alias("price_cents"),
        F.lit(True).alias("deleted"),
        F.lit("batch-del").alias("ingest_tag"),
    )
    wire = upd.unionByName(ins).unionByName(dels)
    contract = (
        "o_orderkey bigint, o_part bigint, cents bigint, "
        "o_orderstatus string, is_del boolean"
    )
    conformed = conform_schema(
        wire,
        contract,
        renames={
            "order_key": "o_orderkey",
            "part_id": "o_part",
            "price_cents": "cents",
            "deleted": "is_del",
        },
    )
    post = upsert_merge(
        base, conformed, ["o_orderkey"], delete_col="is_del",
        partition_col="o_part",
    )
    return post.groupBy("o_part").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents_sum"),
    )


def ann_plan(spark, corpus_df, queries_df):
    from alphavantage_etl_spark.operators.similarity import ann_join

    from alphavantage_etl_spark.queries import _axis_centroids

    return ann_join(
        queries_df, corpus_df, k=5, centroids=_axis_centroids(), n_probe=2
    )


def diverse_plan(spark, corpus_df, queries_df):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        ann_join,
        group_capped_topk,
    )
    from alphavantage_etl_spark.queries import _axis_centroids

    hits = ann_join(
        queries_df, corpus_df, k=15, centroids=_axis_centroids(), n_probe=2
    ).drop("rank")
    labeled = hits.join(
        corpus_df.select(
            F.col("vec_id").alias("corpus_id"),
            (F.col("vec_id") % 7).alias("label"),
        ),
        on="corpus_id",
    )
    return group_capped_topk(
        labeled, ["query_id"], ["label"],
        [F.desc("sim"), F.col("corpus_id")], per_group=2, k=5,
    )


def mmr_plan(spark, corpus_df, queries_df):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        ann_join,
        mmr_rerank,
    )
    from alphavantage_etl_spark.queries import _axis_centroids

    hits = ann_join(
        queries_df, corpus_df, k=10, centroids=_axis_centroids(), n_probe=2
    ).drop("rank")
    cand = hits.join(
        corpus_df.select(F.col("vec_id").alias("corpus_id"), "embedding"),
        on="corpus_id",
    )
    return mmr_rerank(cand, k=5, lam=0.7)


def wall(build_fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        build_fn().collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.sources import load

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    build_fixtures(spark)

    orders_x1 = lambda: load(spark, X1_DIR, "orders").select(  # noqa: E731
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders_x10 = lambda: spark.read.parquet(ORDERS_X10)  # noqa: E731
    emb_x1 = lambda: load(spark, X1_DIR, "embeddings")  # noqa: E731
    emb_x10 = lambda: spark.read.parquet(EMB_X10)  # noqa: E731
    q_frame = lambda src: src().where(  # noqa: E731
        (F.col("vec_id") % 25 == 7) & (F.col("vec_id") < 10_000_000)
    )

    # warmup (codegen compile) once per plan shape
    conformed_merge_plan(spark, orders_x1()).collect()
    ann_plan(spark, emb_x1(), q_frame(emb_x1)).collect()

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "plans": {}}
    t1 = wall(lambda: conformed_merge_plan(spark, orders_x1()))
    t10 = wall(lambda: conformed_merge_plan(spark, orders_x10()))
    out["plans"]["conformed_merge"] = {"x1": t1, "x10": t10,
                                       "slope": round(t10 / t1, 2)}
    a1 = wall(lambda: ann_plan(spark, emb_x1(), q_frame(emb_x1)))
    a10 = wall(lambda: ann_plan(spark, emb_x10(), q_frame(emb_x10)))
    out["plans"]["ann_join_fixed_queries"] = {"x1": a1, "x10": a10,
                                              "slope": round(a10 / a1, 2)}
    diverse_plan(spark, emb_x1(), q_frame(emb_x1)).collect()
    d1 = wall(lambda: diverse_plan(spark, emb_x1(), q_frame(emb_x1)))
    d10 = wall(lambda: diverse_plan(spark, emb_x10(), q_frame(emb_x10)))
    out["plans"]["topk_diverse_fixed_queries"] = {"x1": d1, "x10": d10,
                                                  "slope": round(d10 / d1, 2)}
    mmr_plan(spark, emb_x1(), q_frame(emb_x1)).collect()
    m1 = wall(lambda: mmr_plan(spark, emb_x1(), q_frame(emb_x1)))
    m10 = wall(lambda: mmr_plan(spark, emb_x10(), q_frame(emb_x10)))
    out["plans"]["mmr_rerank_fixed_queries"] = {"x1": m1, "x10": m10,
                                                "slope": round(m10 / m1, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
