#!/usr/bin/env python3
"""End-to-end LLM-corpus pipeline wall at 1x vs 10x (VERDICT r5 #7).

Runs plans.curation.curate_to_shards — curate (quality gate + exact +
near dedup) -> n-gram decontaminate -> chunk -> pack -> shard-partitioned
parquet + manifest — as ONE composition over the sf0.1 documents corpus
and over scripts/scale_slope.py's 10x replicated corpus (translated
replicas: dup families and gram joins grow linearly, the realistic mode).

The wall covers the ENTIRE run including the partitioned write and the
manifest aggregate — this is composition-level evidence, not a per-stage
sum. Prints one JSON document with walls, the wall ratio, and manifest
totals at both scales (the 10x manifest must carry ~10x the tokens or
the composition silently dropped data).

Usage: python scripts/e2e_pipeline_x10.py
(expects /tmp/spark_graft_scale/x10 from scripts/scale_slope.py; the x1
side reads $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"), "x10"
)
OUT = os.environ.get("SPARK_GRAFT_E2E_OUT", "/tmp/spark_graft_e2e")


def run(spark, sf_dir: str, out_path: str) -> tuple[float, dict]:
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.plans.curation import curate_to_shards
    from alphavantage_etl_spark.sources import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bench = d.where(F.col("doc_id") % 47 == 0)
    corp = d.where(F.col("doc_id") % 47 != 0)
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    t0 = time.perf_counter()
    manifest = curate_to_shards(
        corp,
        bench,
        out_path,
        contamination_threshold=0.25,
        chunk_window=64,
        chunk_stride=48,
        shard_tokens=100_000,
    )
    wall = time.perf_counter() - t0
    return wall, manifest


def main() -> None:
    from alphavantage_etl_spark.session import get_spark

    spark = get_spark(app_name="e2e_pipeline_x10")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JIT the minhash/shingle codegen on the smallest SF
    run(spark, "/root/testdata/sf0.001", os.path.join(OUT, "warm"))

    w1, m1 = run(spark, BASE_SF, os.path.join(OUT, "x1"))
    spark.catalog.clearCache()
    w10, m10 = run(spark, X10_DIR, os.path.join(OUT, "x10"))
    print(
        json.dumps(
            {
                "x1_wall_s": round(w1, 2),
                "x10_wall_s": round(w10, 2),
                "wall_ratio_10x_data": round(w10 / w1, 2),
                "x1_manifest": {
                    k: m1[k]
                    for k in ("n_shards", "total_rows", "total_tokens")
                },
                "x10_manifest": {
                    k: m10[k]
                    for k in ("n_shards", "total_rows", "total_tokens")
                },
                "token_growth": round(
                    m10["total_tokens"] / m1["total_tokens"], 2
                ),
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
