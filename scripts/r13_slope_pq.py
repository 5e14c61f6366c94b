#!/usr/bin/env python3
"""10x scale slopes for the r13 PQ branch (X156-X158).

Same fixture discipline as r12_slope/r13_slope: sf0.1 embeddings
replicated 10x; the IVF quantizer AND the PQ codebook train on the x1
corpus and are FROZEN for both scales (X142 — scaling the corpus must
not retrain the model mid-comparison). Plans measured:

- pq_fit_exact (X156): m=4 exact sub-fits, each iters=2 — expect
  ~linear, overhead-dominated at this absolute size.
- ann_join_pq (X157): encode+assign the corpus OUTSIDE the timed
  region (ingest cost), serve = cell join + ADC + top-k over the
  CODED index — candidates grow ~10x with cell population.
- pq_rerank (X158): the X157 shortlist (k'=12) + candidate-bounded
  raw-vector rerank — shortlist size is |Q| x k' at both scales, so
  only the ADC stage grows.

Wall = full plan to collect, min of 2 warm reps. One JSON document.
Do NOT run while any other Spark workload is running.

Usage: python scripts/r13_slope_pq.py
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


def wall(build_fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        build_fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.functions.vectors import dot, l2_norm
    from alphavantage_etl_spark.operators.similarity import (
        ann_join_pq,
        assign_cells_l2q,
        pq_encode_exact,
        pq_fit_exact,
    )
    from alphavantage_etl_spark.queries import (
        _learned_cents_shared,
        _pq_books_shared,
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
    from r13_slope import build_fixtures  # same x10 fixture builder

    build_fixtures(spark)
    cents6 = _learned_cents_shared(spark, X1_DIR)
    books6 = _pq_books_shared(spark, X1_DIR)

    emb_x1 = lambda: load(spark, X1_DIR, "embeddings")  # noqa: E731
    emb_x10 = lambda: spark.read.parquet(EMB_X10)  # noqa: E731
    qb = lambda src: src().where(  # noqa: E731
        (F.col("vec_id") % 25 == 7) & (F.col("vec_id") < 10_000_000)
    )
    corp = lambda src: src().where(F.col("vec_id") % 25 != 7)  # noqa: E731

    def fit_run(src):
        pq_fit_exact(corp(src), m=4, codes=8, iters=2, dim=64).collect()

    # coded indexes built ONCE per scale outside the timed region
    idx = {}

    def build_index(src, tag):
        idx[tag] = (
            assign_cells_l2q(corp(src), cents6, n_probe=1)
            .join(pq_encode_exact(corp(src), books6), on="vec_id")
            .localCheckpoint()
        )

    def adc_run(src, tag):
        ann_join_pq(
            qb(src), k=4,
            query_cells=assign_cells_l2q(qb(src), cents6, n_probe=3),
            corpus_index=idx[tag], books6=books6,
        ).collect()

    def rerank_run(src, tag):
        shortlist = ann_join_pq(
            qb(src), k=12,
            query_cells=assign_cells_l2q(qb(src), cents6, n_probe=3),
            corpus_index=idx[tag], books6=books6,
        ).select("query_id", "corpus_id")
        qv = qb(src).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qvec"),
            l2_norm(F.col("embedding")).alias("__qn"),
        ).where(F.col("__qn") > 0)
        cv = corp(src).select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("__cvec"),
            l2_norm(F.col("embedding")).alias("__cn"),
        ).where(F.col("__cn") > 0)
        sim = F.bround(
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")), 6,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.col("corpus_id")
        )
        (
            shortlist.join(qv, on="query_id").join(cv, on="corpus_id")
            .select("query_id", "corpus_id", sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 4)
            .collect()
        )

    build_index(emb_x1, "x1")
    build_index(emb_x10, "x10")
    # warmup (codegen) once per plan shape
    fit_run(emb_x1)
    adc_run(emb_x1, "x1")
    rerank_run(emb_x1, "x1")

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "queries": {}}
    for name, x1_fn, x10_fn in [
        ("pq_fit", lambda: fit_run(emb_x1), lambda: fit_run(emb_x10)),
        ("ann_join_pq", lambda: adc_run(emb_x1, "x1"),
         lambda: adc_run(emb_x10, "x10")),
        ("pq_rerank", lambda: rerank_run(emb_x1, "x1"),
         lambda: rerank_run(emb_x10, "x10")),
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
