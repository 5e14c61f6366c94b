#!/usr/bin/env python3
"""10x scale slope for the r14 cascade funnel (X170) at birth.

Reuses the r14_slope_bq fixtures (x10 embeddings + prebuilt bit
indexes) and adds a prebuilt PQ-codes parquet per scale; the timed
region is the full three-stage serve — Hamming wide shortlist from the
stored bit index, ADC mid-rerank from the stored codes, exact cosine
top-k — against a FIXED x1 query batch. A flat slope is the funnel
contract: the only corpus-sized input is the bit scan; codes and raw
vectors attach candidate-bounded.

Usage: python scripts/r14_slope_cascade.py   (after r14_slope_bq.py)
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
PQ_X1 = "/tmp/spark_graft_scale/pq_codes_x1"
PQ_X10 = "/tmp/spark_graft_scale/pq_codes_x10"


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
        ann_cascade,
        assign_cells_l2q,
        bq_fit,
        pq_encode_exact,
        pq_fit_exact,
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
    for req in (EMB_X10, IDX_X1, IDX_X10):
        if not os.path.exists(os.path.join(req, "_SUCCESS")):
            raise SystemExit(f"run scripts/r14_slope_bq.py first ({req})")

    emb = load(spark, X1_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 7)
    cents6 = _learned_cents_shared(spark, X1_DIR)
    corpus_x1 = emb.where(F.col("vec_id") % 25 != 7)
    corpus_x10 = spark.read.parquet(EMB_X10).where(
        F.col("vec_id") % 25 != 7
    )
    sums6, n_fit = bq_fit(corpus_x1, dim=64, sample_cap=2048)
    fit = pq_fit_exact(
        corpus_x1, m=4, codes=8, iters=2, dim=64, sample_cap=2048
    ).collect()
    books6 = [[[0] * 16 for _ in range(8)] for _ in range(4)]
    for r in fit:
        books6[r["subspace"]][r["code"]][r["dim"]] = int(r["c6"])

    for src, path in ((corpus_x1, PQ_X1), (corpus_x10, PQ_X10)):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            pq_encode_exact(src, books6).write.mode("overwrite").parquet(
                path
            )

    qc = assign_cells_l2q(queries, cents6, n_probe=3).localCheckpoint()

    def serve(bq_path, pq_path, corpus):
        ann_cascade(
            queries, corpus, k=5, k_mid=16, k_wide=48, query_cells=qc,
            bq_index=spark.read.parquet(bq_path), sums6=sums6,
            n_fit=n_fit, pq_codes=spark.read.parquet(pq_path),
            books6=books6,
        ).collect()

    serve(IDX_X1, PQ_X1, corpus_x1)  # warmup (codegen compile)

    out = {"sf_dir": X1_DIR, "replicas": 10, "queries": {}}
    w1 = wall(lambda: serve(IDX_X1, PQ_X1, corpus_x1))
    w10 = wall(lambda: serve(IDX_X10, PQ_X10, corpus_x10))
    out["queries"]["ann_cascade"] = {
        "x1_sec": w1,
        "x10_sec": w10,
        "slope": round(w10 / w1, 2) if w1 else None,
    }
    print("ann_cascade", out["queries"]["ann_cascade"], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
