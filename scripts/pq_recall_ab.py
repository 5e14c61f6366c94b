"""Recall A/B: residual IVF-PQ (X164) vs absolute-vector IVF-PQ (X157).

Measures recall@k of the ADC ranking against EXACT integer squared-L2
ground truth on the same u6 grid, at the same m/codes/iters, for two
probe settings:

- n_probe = n_cells (exhaustive probing) — isolates pure codebook
  quality: both variants score every candidate, so any recall gap is
  the residual layout's, not the IVF truncation's.
- n_probe = 2 (the q_pq_residual serving shape) — the end-to-end
  number a user sees.

Writes ONE JSON artifact: per (variant, n_probe), mean recall@k over
the query batch, plus the shared config. Run:

    python scripts/pq_recall_ab.py scripts/pq_recall_r14.json [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        _q6_base,
        ann_join_pq,
        assign_cells_l2q,
        pq_encode_exact,
        pq_fit_exact,
    )
    from alphavantage_etl_spark.queries import _learned_cents_shared
    from alphavantage_etl_spark.sources import load

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("pq-recall-ab")
        .getOrCreate()
    )
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 7)
    corpus = emb.where(F.col("vec_id") % 25 != 7)
    cents6 = _learned_cents_shared(spark, sf_dir)
    n_cells = len(cents6)

    def books_of(residual: bool, m: int, codes: int):
        d_sub = 64 // m
        fit = pq_fit_exact(
            corpus,
            m=m,
            codes=codes,
            iters=2,
            dim=64,
            residual_cents6=cents6 if residual else None,
        ).collect()
        books = [[[0] * d_sub for _ in range(codes)] for _ in range(m)]
        for r in fit:
            books[r["subspace"]][r["code"]][r["dim"]] = int(r["c6"])
        return books

    # exact integer-L2 ground truth on the u6 grid (driver-side — the
    # diagnostic runs on the test box; the engine's exact path is
    # q_ann_recall's crossJoin form)
    q6q = {
        r["__id"]: list(r["__q6"])
        for r in _q6_base(queries, 64, "embedding", "vec_id").collect()
    }
    q6c = {
        r["__id"]: list(r["__q6"])
        for r in _q6_base(corpus, 64, "embedding", "vec_id").collect()
    }
    truth: dict[int, set[int]] = {}
    for qid, qv in q6q.items():
        scored = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
            for cid, cv in q6c.items()
        )
        truth[qid] = {cid for _, cid in scored[:k]}

    results: dict[str, dict[str, dict[str, float]]] = {}
    for m, codes in ((4, 8), (8, 16)):
        per_var: dict[str, dict[str, float]] = {}
        for residual in (False, True):
            books = books_of(residual, m, codes)
            idx = (
                pq_encode_exact(corpus, books, residual_cents6=cents6)
                if residual
                else assign_cells_l2q(corpus, cents6, n_probe=1).join(
                    pq_encode_exact(corpus, books), on="vec_id"
                )
            ).localCheckpoint()
            per_probe: dict[str, float] = {}
            for n_probe in (2, n_cells):
                qc = assign_cells_l2q(queries, cents6, n_probe=n_probe)
                got = ann_join_pq(
                    queries,
                    k=k,
                    query_cells=qc,
                    corpus_index=idx,
                    books6=books,
                    residual_cents6=cents6 if residual else None,
                ).collect()
                hits: dict[int, int] = {}
                for r in got:
                    if r["corpus_id"] in truth[r["query_id"]]:
                        hits[r["query_id"]] = hits.get(r["query_id"], 0) + 1
                rec = sum(hits.get(q, 0) for q in truth) / (k * len(truth))
                per_probe[f"n_probe={n_probe}"] = round(rec, 4)
            per_var["residual" if residual else "absolute"] = per_probe
        results[f"m={m},codes={codes}"] = per_var

    artifact = {
        "sf_dir": sf_dir,
        "config": {"iters": 2, "k": k,
                   "n_cells": n_cells, "n_queries": len(q6q),
                   "n_corpus": len(q6c)},
        "recall_at_k": results,
    }
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(json.dumps(artifact, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
