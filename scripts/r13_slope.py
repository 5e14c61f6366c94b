#!/usr/bin/env python3
"""10x scale slopes for the r13 additions (X153-X155).

Corpus = the sf0.1 embeddings replicated 10x (vec_id shifted by
r * 10^7; vectors reused — the r12_slope fixture). The x1-trained
quantizer is FROZEN for both scales where a stage consumes one (the
X142 serving rule). Plans measured:

- kmeans_fit_hd (X154): the narrow posexplode fit at dim 512 (the
  64-dim vectors tiled x8 in-plan), n_cells=4, iters=2 — per
  iteration one BNLJ matrix attach + explode + (cell, d) combine;
  expect ~linear in rows, overhead-dominated at this absolute size.
- ann_serve (X155): load + probe ONLY against a PREBUILT persisted
  index at each scale (the build+save is outside the timed region —
  that cost lives in q_ann_join_indexed's row). Fixed x1 query batch;
  candidates grow ~10x with cell population.
- index_lifecycle (X153): state(base) + state(batch) -> PSI-gated
  refit -> assign under v2 -> hot-cell split -> delta fold -> serve.
  Every stage is cell/pair-keyed or member-bounded; expect ~linear.

Wall = full plan to collect, min of 2 warm reps. One JSON document.
Do NOT run while any other Spark workload is running.

Usage: python scripts/r13_slope.py
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
        apply_assignment_delta,
        assign_cells_l2q,
        kmeans_fit_quantized,
        kmeans_state,
        load_ivf_index,
        psi_gated_refit,
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

    def fit_hd_run(src):
        hd = src().select(
            "vec_id",
            F.flatten(F.array_repeat(F.col("embedding"), 8)).alias(
                "embedding"
            ),
        )
        kmeans_fit_quantized(hd, n_cells=4, iters=2, dim=512).collect()

    serve_paths: dict[str, str] = {}

    def serve_prepare(src, tag):
        path = f"/tmp/spark_graft_scale/ivf_serve_{tag}"
        save_ivf_index(
            assign_cells_l2q(corp(src), cents6, n_probe=1),
            [[float(x) for x in c] for c in cents6],
            path,
        )
        serve_paths[tag] = path

    def serve_run(src, tag):
        idx, loaded = load_ivf_index(spark, serve_paths[tag])
        cents_rt = [[int(x) for x in c] for c in loaded]
        ann_join(
            qb(src), corp(src), k=4, corpus_cells=idx,
            query_cells=assign_cells_l2q(qb(src), cents_rt, n_probe=2),
        ).collect()

    def lifecycle_run(src):
        base = corp(src)
        batch = qb(src).where(F.element_at(F.col("embedding"), 1) > 0)
        v2, _, _ = psi_gated_refit(
            kmeans_state(base, cents6),
            kmeans_state(batch, cents6),
            cents6,
        )
        corpus2 = base.unionByName(batch)
        asn = assign_cells_l2q(corpus2, v2, n_probe=1)
        v3, delta = split_hot_cells(
            corpus2, v2, hot_factor=1.05, max_splits=1, sub_cells=2,
            iters=2,
        )
        idx2 = apply_assignment_delta(asn, delta)
        ann_join(
            qb(src), corpus2, k=3, corpus_cells=idx2,
            query_cells=assign_cells_l2q(qb(src), v3, n_probe=2),
        ).collect()

    # warmup (codegen compile) once per plan shape; also prebuilds the
    # serve indexes OUTSIDE the timed region
    serve_prepare(emb_x1, "x1")
    serve_prepare(emb_x10, "x10")
    fit_hd_run(emb_x1)
    serve_run(emb_x1, "x1")
    lifecycle_run(emb_x1)

    out = {"sf_dir": X1_DIR, "replicas": REPLICAS, "queries": {}}
    for name, x1_fn, x10_fn in [
        ("kmeans_fit_hd", lambda: fit_hd_run(emb_x1),
         lambda: fit_hd_run(emb_x10)),
        ("ann_serve", lambda: serve_run(emb_x1, "x1"),
         lambda: serve_run(emb_x10, "x10")),
        ("index_lifecycle", lambda: lifecycle_run(emb_x1),
         lambda: lifecycle_run(emb_x10)),
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
