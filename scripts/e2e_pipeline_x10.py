#!/usr/bin/env python3
"""End-to-end LLM-corpus pipeline wall at 1x vs 10x (VERDICT r5 #7).

Runs plans.curation.curate_to_shards — curate (quality gate + exact +
near dedup) -> n-gram decontaminate -> chunk -> pack -> shard-partitioned
parquet + manifest — as ONE composition over the sf0.1 documents corpus
and over a 10x replicated corpus.

Growth model (r7, VERDICT r6 #4 — TOKEN-NEUTRAL): each replica applies a
WORD-level consonant rotation that leaves STOPWORDS verbatim — length,
punctuation, stopword ratio and mean token length are all preserved, so
the quality gate scores every replica exactly like the original and the
pipeline's selectivity is constant across replicas (token growth ==
docs growth). Content-word consonants rotate by a replica-specific
offset, so replica vocabularies stay (near-)disjoint and dup families /
gram joins still grow linearly — the realistic mode. (The r6 run used
scale_slope.py's CHARACTER-level vowel translation, which destroyed
stopwords; the gate then scored replicas more harshly and token growth
read 7.76x for 10x docs — a fixture artifact, not pipeline behavior.)

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
    os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"),
    "x10_tokenneutral",
)
OUT = os.environ.get("SPARK_GRAFT_E2E_OUT", "/tmp/spark_graft_e2e")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

_CONSONANTS = "bcdfghjklmnpqrstvwxyz"


def generate_token_neutral(spark, out_dir: str) -> None:
    """10x documents with the token-neutral per-replica translation:
    stopwords verbatim, content-word consonants rotated by 5*r places
    within the 21-letter consonant alphabet (length-preserving
    bijection; 5*r mod 21 is distinct and nonzero for r = 1..9, so all
    ten replica vocabularies are pairwise disjoint — an offset that
    collides mod 21 would hand near-dup dedup byte-identical replica
    pairs and silently collapse the corpus), digits rotated by r.
    Quality-gate features are replica-invariant; content vocabularies
    are replica-disjoint."""
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.functions.text import STOPWORDS

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    n_docs = docs.count()
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            txt = F.col("text")
        else:
            src = _CONSONANTS + _CONSONANTS.upper() + "0123456789"
            rot = "".join(
                _CONSONANTS[(i + 5 * r) % 21] for i in range(21)
            )
            dst = (
                rot
                + rot.upper()
                + "".join(str((d + r) % 10) for d in range(10))
            )

            def _tok_fn(s=src, d=dst):
                def fn(t):
                    return F.when(
                        F.lower(t).isin(list(STOPWORDS)), t
                    ).otherwise(F.translate(t, s, d))

                return fn

            txt = F.array_join(
                F.transform(
                    F.split(F.col("text"), " ", -1), _tok_fn()
                ),
                " ",
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def run(
    spark, sf_dir: str, out_path: str, base_mod: int | None = None
) -> tuple[float, dict]:
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.plans.curation import curate_to_shards
    from alphavantage_etl_spark.sources import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    # bench/corp split on the BASE id (doc_id mod the base-corpus size),
    # so every replica benches the SAME underlying documents — replica
    # selectivity is then identical by construction and token growth
    # measures the PIPELINE's scaling, not which-docs-got-benched
    # variance (at x1 ids are < base_mod, so this is the identity split)
    bid = (F.col("doc_id") % base_mod) if base_mod else F.col("doc_id")
    bench = d.where(bid % 47 == 0)
    corp = d.where(bid % 47 != 0)
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


def run_retrieval(spark, emb_df, tag: str) -> tuple[float, float, int]:
    """The retrieval tail of the pipeline (r13 verdict next #7): the
    curated corpus's embeddings are INGESTED into a persisted IVF
    index (assign under the frozen x1-trained quantizer + save — the
    once-per-corpus cost), then a FIXED x1 query batch SERVES from the
    stored index (load + probe only — the recurring cost). Returns
    (ingest_wall, serve_wall, n_hits). The quantizer trains once at x1
    and is frozen for both scales (the X142 serving rule)."""
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.similarity import (
        ann_join,
        assign_cells_l2q,
        load_ivf_index,
        save_ivf_index,
    )
    from alphavantage_etl_spark.queries import _learned_cents_shared

    cents6 = _learned_cents_shared(spark, BASE_SF)
    corpus = emb_df.where(F.col("vec_id") % 25 != 7)
    queries = emb_df.where(
        (F.col("vec_id") % 25 == 7) & (F.col("vec_id") < 10_000_000)
    )
    path = os.path.join(OUT, f"ivf_{tag}")
    t0 = time.perf_counter()
    save_ivf_index(
        assign_cells_l2q(corpus, cents6, n_probe=1),
        [[float(x) for x in c] for c in cents6],
        path,
    )
    ingest = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx, loaded = load_ivf_index(spark, path)
    cents_rt = [[int(x) for x in c] for c in loaded]
    hits = ann_join(
        queries,
        corpus,
        k=4,
        corpus_cells=idx,
        query_cells=assign_cells_l2q(queries, cents_rt, n_probe=2),
    ).count()
    serve = time.perf_counter() - t0
    return ingest, serve, hits


def main() -> None:
    from alphavantage_etl_spark.session import get_spark

    spark = get_spark(app_name="e2e_pipeline_x10")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{X10_DIR}/documents.parquet/_SUCCESS"):
        generate_token_neutral(spark, X10_DIR)

    # warmup: JIT the minhash/shingle codegen on the smallest SF
    run(spark, "/root/testdata/sf0.001", os.path.join(OUT, "warm"))

    n_base = spark.read.parquet(f"{BASE_SF}/documents.parquet").count()
    w1, m1 = run(spark, BASE_SF, os.path.join(OUT, "x1"), n_base)
    spark.catalog.clearCache()
    w10, m10 = run(spark, X10_DIR, os.path.join(OUT, "x10"), n_base)

    # retrieval tail (r13 verdict next #7): x10 embeddings fixture from
    # scripts/r13_slope.py / r14_slope.py (vec_id-shifted replicas)
    emb_x10_path = os.path.join(
        os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"),
        "embeddings_x10",
    )
    retrieval = {}
    if os.path.exists(os.path.join(emb_x10_path, "_SUCCESS")):
        from alphavantage_etl_spark.sources import load as _load

        # warm the serving codegen once
        run_retrieval(spark, _load(spark, BASE_SF, "embeddings"), "warm")
        i1, s1, h1 = run_retrieval(
            spark, _load(spark, BASE_SF, "embeddings"), "x1"
        )
        spark.catalog.clearCache()
        i10, s10, h10 = run_retrieval(
            spark, spark.read.parquet(emb_x10_path), "x10"
        )
        retrieval = {
            "ann_ingest_x1_s": round(i1, 2),
            "ann_ingest_x10_s": round(i10, 2),
            "ann_ingest_ratio": round(i10 / i1, 2),
            "ann_serve_x1_s": round(s1, 2),
            "ann_serve_x10_s": round(s10, 2),
            "ann_serve_ratio": round(s10 / s1, 2),
            "hits_x1": h1,
            "hits_x10": h10,
        }

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
                **retrieval,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
