#!/usr/bin/env python3
"""10x scale slope for the r14 BQ tier (X167/X168) at birth.

Corpus = the sf0.1 embeddings replicated 10x (the r12-r14 slope
fixture, vec_id shifted by r * 10^7). The bit index is built ONCE per
scale outside the timed region (ingest), so the measured number is the
SERVING shape the operator docstring claims scales: one cell equi-join
of the (id, cell, bits) parquet against the bare probe frame, hamming
= bit_count(xor) folds, WindowGroupLimit-pre-limited candidates.
Queries are the FIXED x1 probe set (|Q| bounded by construction), so a
flat slope means corpus growth only grows the broadcast-probed scan —
the 100 TB contract. bq_rerank adds the |Q| x k'-bounded exact cosine
stage on top; its slope should match.

Wall = full plan to collect, min of 2 warm reps. One JSON document.
Do NOT run while any other Spark workload is running.

Usage: python scripts/r14_slope_bq.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X1_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EMB_X10 = "/tmp/spark_graft_scale/embeddings_x10"
IDX_X1 = "/tmp/spark_graft_scale/bq_index_x1"
IDX_X10 = "/tmp/spark_graft_scale/bq_index_x10"
REPLICAS = 10


def build_fixtures(spark):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.sources import load

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


def wall(build_fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        build_fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        ann_join_bq,
        assign_cells_l2q,
        bq_encode,
        bq_fit,
        topk_exact_rerank,
    )
    from alphavantage_etl_spark.queries import _learned_cents_shared
    from alphavantage_etl_spark.sources import load

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_fixtures(spark)

    emb = load(spark, X1_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 7)
    cents6 = _learned_cents_shared(spark, X1_DIR)
    corpus_x1 = emb.where(F.col("vec_id") % 25 != 7)
    # model fit on the x1 corpus with the standing bounded sample —
    # O(sample), reused for both scales (serving never refits)
    sums6, n_fit = bq_fit(corpus_x1, dim=64, sample_cap=2048)

    # ingest (untimed): (id, cell, bits) parquet per scale
    for src, path in [
        (corpus_x1, IDX_X1),
        (spark.read.parquet(EMB_X10).where(F.col("vec_id") % 25 != 7),
         IDX_X10),
    ]:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            assign_cells_l2q(src, cents6, n_probe=1).join(
                bq_encode(src, sums6, n_fit), on="vec_id"
            ).write.mode("overwrite").parquet(path)

    qc = assign_cells_l2q(queries, cents6, n_probe=3).localCheckpoint()

    def serve(path):
        idx = spark.read.parquet(path)
        return ann_join_bq(
            queries, k=6, query_cells=qc, corpus_index=idx,
            sums6=sums6, n_fit=n_fit,
        )

    def serve_collect(path):
        serve(path).collect()

    def rerank_collect(path, corpus):
        topk_exact_rerank(
            serve(path).select("query_id", "corpus_id"),
            queries, corpus, k=4,
        ).collect()

    corpus_x10 = spark.read.parquet(EMB_X10).where(
        F.col("vec_id") % 25 != 7
    )
    # warmup (codegen compile) once per plan shape
    serve_collect(IDX_X1)
    rerank_collect(IDX_X1, corpus_x1)

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "queries": {}}
    for name, x1_fn, x10_fn in [
        ("ann_bq_serve", lambda: serve_collect(IDX_X1),
         lambda: serve_collect(IDX_X10)),
        ("bq_rerank", lambda: rerank_collect(IDX_X1, corpus_x1),
         lambda: rerank_collect(IDX_X10, corpus_x10)),
    ]:
        w1 = wall(x1_fn)
        w10 = wall(x10_fn)
        out["queries"][name] = {
            "x1_sec": w1,
            "x10_sec": w10,
            "slope": round(w10 / w1, 2) if w1 else None,
        }
        print(name, out["queries"][name], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
