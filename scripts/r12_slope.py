#!/usr/bin/env python3
"""10x scale slopes for the r12 index-lifecycle additions (X147-X150).

Corpus = the sf0.1 embeddings replicated 10x (vec_id shifted by
r * 10^7; vectors reused). The quantizer is the X146 learned fit from
the x1 corpus, FROZEN for both scales (the X142 serving rule — scaling
the corpus must not retrain the model mid-comparison). Plans measured:

- kmeans_state: one narrow scan + cell agg -> expect ~linear, heavily
  overhead-dominated at this absolute size.
- refit (state(corpus) ++ state(batch) -> merge -> finalize): two scans
  + model-row merges -> ~linear.
- split_hot_cells: assign+checkpoint pass, count collect, one 2-way
  sub-fit over the hot cell's members (2 iters) -> ~linear in the hot
  cell's size.
- assignment_moves: one scan with two centroid matrices -> ~linear.
- ann_join_indexed serving path: save assignments + load + probe join
  (k=3, n_probe=3, fixed x1 query batch) -> candidates grow ~10x with
  cell population; includes the index parquet write at each scale.

Wall = full plan to collect, min of 2 warm reps. One JSON document.
Do NOT run while any other Spark workload is running.

Usage: python scripts/r12_slope.py
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
        ann_join,
        assign_cells_l2q,
        assignment_moves,
        kmeans_refit,
        kmeans_state,
        load_ivf_index,
        merge_kmeans_states,
        save_ivf_index,
        split_hot_cells,
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
    cents6 = _learned_cents_shared(spark, X1_DIR)

    emb_x1 = lambda: load(spark, X1_DIR, "embeddings")  # noqa: E731
    emb_x10 = lambda: spark.read.parquet(EMB_X10)  # noqa: E731
    # fixed x1 query batch at both scales (a query batch is a batch)
    qb = lambda src: src().where(  # noqa: E731
        (F.col("vec_id") % 25 == 7) & (F.col("vec_id") < 10_000_000)
    )
    corp = lambda src: src().where(F.col("vec_id") % 25 != 7)  # noqa: E731

    def state_run(src):
        kmeans_state(corp(src), cents6).collect()

    def refit_run(src):
        base = kmeans_state(corp(src), cents6)
        batch = kmeans_state(qb(src), cents6)
        kmeans_refit(merge_kmeans_states(base, batch), cents6)

    def split_run(src):
        _, delta = split_hot_cells(
            corp(src), cents6, hot_factor=1.05, max_splits=1,
            sub_cells=2, iters=2,
        )
        delta.collect()

    def moves_run(src):
        base = kmeans_state(src(), cents6)
        new_cents, _ = kmeans_refit(base, cents6)
        assignment_moves(src(), cents6, new_cents).collect()

    def indexed_run(src, tag):
        path = f"/tmp/spark_graft_scale/ivf_{tag}"
        save_ivf_index(
            assign_cells_l2q(corp(src), cents6, n_probe=1),
            [[float(x) for x in c] for c in cents6],
            path,
        )
        idx, loaded = load_ivf_index(spark, path)
        cents_rt = [[int(x) for x in c] for c in loaded]
        ann_join(
            qb(src), corp(src), k=3, corpus_cells=idx,
            query_cells=assign_cells_l2q(qb(src), cents_rt, n_probe=3),
        ).collect()

    plans = {
        "kmeans_state": lambda s, tag: state_run(s),
        "kmeans_refit": lambda s, tag: refit_run(s),
        "ivf_cell_split": lambda s, tag: split_run(s),
        "refit_moves": lambda s, tag: moves_run(s),
        "ann_join_indexed": indexed_run,
    }
    # warmup (codegen compile) once per plan shape
    for name, fn in plans.items():
        fn(emb_x1, "warm")

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "queries": {}}
    for name, fn in plans.items():
        w1 = wall(lambda: fn(emb_x1, "x1"))
        w10 = wall(lambda: fn(emb_x10, "x10"))
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
