#!/usr/bin/env python3
"""10x scale slope for the r14 addition (X161 bounded-sample fit).

Corpus = the sf0.1 embeddings replicated 10x (vec_id shifted by
r * 10^7; vectors reused — the r12/r13_slope fixture). Two plans,
measured head-to-head so the artifact shows the fix directly:

- kmeans_fit_hd (X154, full-corpus fit): every Lloyd iteration scans
  the whole corpus — the r13 birth slope was 4.01x, the one scale
  watch item the r13 verdict flagged (wrong #2).
- kmeans_fit_sampled (X161): the SAME dim-512 narrow fit trained on
  the 256 smallest-(md5, id) rows (_fit_sample). The only corpus-
  sized work left is the ONE narrow top-k sampling pass, so the
  slope should collapse toward ~1.0x.

Wall = full plan to collect, min of 2 warm reps. One JSON document.
Do NOT run while any other Spark workload is running.

Usage: python scripts/r14_slope.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X1_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EMB_X10 = "/tmp/spark_graft_scale/embeddings_x10"
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
        kmeans_fit_quantized,
    )
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

    emb_x1 = lambda: load(spark, X1_DIR, "embeddings")  # noqa: E731
    emb_x10 = lambda: spark.read.parquet(EMB_X10)  # noqa: E731

    def hd(src):
        return src().select(
            "vec_id",
            F.flatten(F.array_repeat(F.col("embedding"), 8)).alias(
                "embedding"
            ),
        )

    def fit_full(src):
        kmeans_fit_quantized(hd(src), n_cells=4, iters=2, dim=512).collect()

    def fit_sampled(src):
        kmeans_fit_quantized(
            hd(src), n_cells=4, iters=2, dim=512, sample_cap=256
        ).collect()

    # warmup (codegen compile) once per plan shape
    fit_full(emb_x1)
    fit_sampled(emb_x1)

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "queries": {}}
    for name, x1_fn, x10_fn in [
        ("kmeans_fit_hd_full", lambda: fit_full(emb_x1),
         lambda: fit_full(emb_x10)),
        ("kmeans_fit_sampled", lambda: fit_sampled(emb_x1),
         lambda: fit_sampled(emb_x10)),
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
