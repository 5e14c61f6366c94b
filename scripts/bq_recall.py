"""Recall of the BQ bit tier (X167/X168) vs exact-cosine ground truth.

Measures, on the contract fixture (sf0.1 embeddings, the shared 8-cell
quantizer), mean recall@k over the query batch for:

- raw Hamming top-k (`ann_join_bq`) at n_probe 2 / 8 (8 = exhaustive:
  isolates pure bit-code quality from IVF truncation), and
- the X168 composition (`ann_join_bq_rerank`) at several shortlist
  widths — the recall lever the docstring names: Hamming is the
  coarsest surrogate in the stack (many ties), so widening k' lets the
  exact stage see past hyperoctant ties.

Ground truth = exact cosine top-k on the raw vectors (driver-side —
this is a diagnostic; the engine's exact path is q_ann_recall's
crossJoin form). Writes ONE JSON artifact. Run:

    python scripts/bq_recall.py scripts/bq_recall_r14.json [sf_dir]
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        ann_join_bq,
        ann_join_bq_rerank,
        assign_cells_l2q,
        bq_encode,
        bq_fit,
    )
    from alphavantage_etl_spark.queries import _learned_cents_shared
    from alphavantage_etl_spark.sources import load

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("bq-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 7)
    corpus = emb.where(F.col("vec_id") % 25 != 7)
    cents6 = _learned_cents_shared(spark, sf_dir)
    n_cells = len(cents6)
    sums6, n_fit = bq_fit(corpus, dim=64)
    idx = (
        assign_cells_l2q(corpus, cents6, n_probe=1)
        .join(bq_encode(corpus, sums6, n_fit), on="vec_id")
        .localCheckpoint()
    )

    # exact cosine ground truth (driver-side diagnostic)
    qv = {r["vec_id"]: list(r["embedding"]) for r in queries.collect()}
    cv = {r["vec_id"]: list(r["embedding"]) for r in corpus.collect()}

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    truth: dict[int, set[int]] = {}
    for qid, q in qv.items():
        nq = norm(q)
        scored = sorted(
            (
                -sum(a * b for a, b in zip(q, c)) / (nq * norm(c)),
                cid,
            )
            for cid, c in cv.items()
            if norm(c) > 0
        )
        truth[qid] = {cid for _, cid in scored[:k]}

    def recall(rows) -> float:
        hits: dict[int, int] = {}
        for r in rows:
            if r["corpus_id"] in truth[r["query_id"]]:
                hits[r["query_id"]] = hits.get(r["query_id"], 0) + 1
        return round(sum(hits.get(q, 0) for q in truth) / (k * len(truth)), 4)

    out = {
        "sf_dir": sf_dir,
        "config": {
            "k": k,
            "n_cells": n_cells,
            "n_queries": len(qv),
            "n_corpus": len(cv),
        },
        "recall_at_k": {"hamming_topk": {}, "rerank": {}},
    }
    for n_probe in (2, n_cells):
        qc = assign_cells_l2q(queries, cents6, n_probe=n_probe)
        out["recall_at_k"]["hamming_topk"][f"n_probe={n_probe}"] = recall(
            ann_join_bq(
                queries, k=k, query_cells=qc, corpus_index=idx,
                sums6=sums6, n_fit=n_fit,
            ).collect()
        )
        per_short = {}
        for k_short in (k, 2 * k, 4 * k, 8 * k):
            per_short[f"k_shortlist={k_short}"] = recall(
                ann_join_bq_rerank(
                    queries, corpus, k=k, k_shortlist=k_short,
                    query_cells=qc, corpus_index=idx,
                    sums6=sums6, n_fit=n_fit,
                ).collect()
            )
        out["recall_at_k"]["rerank"][f"n_probe={n_probe}"] = per_short
        print(n_probe, out["recall_at_k"]["hamming_topk"], per_short,
              file=sys.stderr)
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
