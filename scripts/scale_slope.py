#!/usr/bin/env python3
"""Empirical scale-slope harness for the heavy five (VERDICT r3 #2).

The 100x scale claims in PERF.md rest on plan shape; this measures the
actual wall-time slope of the five most expensive queries when the corpus
grows 10x, holding DATA DENSITY realistic:

- ``documents`` replicates 10x with fresh doc_ids and a per-replica
  character translation (vowels -> replica-specific consonants, digits
  rotated by the replica index). Translation preserves length and
  within-replica structure exactly — every replica carries the same
  planted near-dups and contained benchmark leaks — while making the
  k-gram/shingle vocabularies of different replicas (near-)disjoint, so
  duplicate families and gram-join fan-outs grow LINEARLY with the data,
  the way a real corpus grows. Naive replication would instead mint 10
  byte-identical copies of every document: every LSH bucket and gram key
  would grow 10x dense and the measurement would show the quadratic of a
  degenerate corpus, not the engine's slope.
- ``embeddings`` replicates 10x with fresh vec_ids and a per-replica
  deterministic SIGN-FLIP pattern: within-replica cosines are exactly
  preserved (both sides flip identically), cross-replica cosines scramble
  to ~0, so the planted near-dup structure also grows linearly. Two
  variants ship:
  * ``x10`` — IVF cell count scales with N (fresh ``label`` range per
    replica): the production scaling discipline for IVF-blocked ops;
  * ``x10_fixedcells`` — labels unchanged, so each cell grows 10x dense:
    measures the documented within-cell quadratic of ``embedding_near_
    dups`` when the quantizer is NOT rescaled (the mitigation being
    exactly what ``x10`` does).

Timing protocol matches bench.py: warmup on sf0.001, min of
$SPARK_GRAFT_BENCH_REPS (default 2) reps, clearCache between reps, noop
sink. Prints one JSON document with per-factor timings and slopes
(t_10x / t_1x; linear scaling => slope <= ~10).

Usage: python scripts/scale_slope.py   (writes under /tmp/spark_graft_scale)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

DOC_QUERIES = [
    "q_contamination",
    "q_dedup_near_verified",
    "q_tfidf_terms",
    # r4 heavy additions over documents
    "q_cdc_overlap",
    "q_lm_perplexity",
    # late-r4 additions over documents (DSIR/logreg: hashed-bucket model
    # tables stay FIXED-size as the corpus grows; block dedup and
    # collocations: vocabularies disjoint per replica -> linear growth)
    "q_dsir_weights",
    "q_logreg",
    "q_block_dedup",
    "q_collocations",
    # r5: train + exact AUC over the 10x corpus (score grid stays
    # distinct-score-bounded; training is the dominant, linear part)
    "q_auc",
    # r5 additions: BPE rounds run over the vocab-bounded word-frequency
    # table (expect ~flat); the replicas' translated vocabularies make
    # the word table grow linearly, the realistic mode
    "q_bpe_merges",
    # r6 (VERDICT r5 #6): the remaining unmeasured r5 heavies
    "q_bpe_segments",
    "q_quantile_norm",
    # rrf: both rankers (BM25 over documents, dense cosine over
    # embeddings) run in full; fusion itself is top-k-bounded
    "q_rrf_fusion",
    # r6 additions over documents >= 1 s at sf0.1
    "q_novelty",
    "q_ipw",
    # r8 (VERDICT r7 #7): the two unmeasured >= 1 s r7 newcomers.
    # curriculum: the window runs over the distinct-quality grid
    # (1e-6-quantized score in [0,1] — value-bounded, expect ~flat past
    # the scoring scan); ndcg: per-(term, doc) counts are corpus-linear,
    # the rank window runs per-term over docs-containing-term.
    "q_curriculum",
    "q_ndcg",
    # late r8: the >= 1 s r8 newcomers over documents. avg_precision
    # rides the shared logreg scores (two-level rank: block offsets
    # over the distinct-score grid + per-score row_numbers — expect
    # ~training-bound); mrr is one (query, doc) join + per-query min.
    "q_avg_precision",
    "q_mrr",
]
EMB_QUERIES = [
    "q_embed_near_dup",
    "q_dedup_clusters",
    "q_semantic_dedup",
    # r5: cell-blocked candidate top-k and two-phase global ranking —
    # both share the cells-∝-N discipline measured by the x10/fixedcells
    # pair
    "q_knn_graph",
    "q_negative_samples",
    # r5 addition: LPA over the k-NN graph — candidate generation
    # dominates, same cells discipline
    "q_label_propagation",
    "q_graph_walks",
    "q_kcenter_coreset",
    # late r8: per-point cost is |labels| centroid distances; labels
    # grow with N under the x10 fresh-label-range discipline, so the
    # (point x label) frame grows ~linearly at fixed per-replica k
    "q_silhouette",
]
# r5: the TPC-H-shaped heavies. Replication offsets order/cust/supp keys
# per replica while NATIONS STAY FIXED — orders, customers, suppliers and
# line items grow with the business; the nation graph does not. PageRank
# and triangle counting therefore aggregate 10x the edge-weight input
# into the same 25-node graph (the realistic growth mode for an
# entity-graph rollup), and the bootstrap resamples 10x the orders into
# the same 5 priority groups.
TPCH_QUERIES = [
    "q_bootstrap_ci",
    "q_pagerank",
    "q_triangles",
    # r6: fuzzy linkage over the replicated customer feed. The replicas
    # carry digit-ROTATED names (see _replicate_keyed text_cols): a 10x
    # business has 10x distinct names, so blocks grow in NUMBER, not
    # density. Identical-name replication (the pre-r6 mode) instead made
    # every suffix block 10x dense and every dirty name match 10 masters
    # — the 5.5x "worst ratio" the r5 full-suite run flagged was that
    # degenerate-corpus artifact, not the operator's slope.
    "q_linkage",
    # r6 additions over orders >= 1 s at sf0.1 (weekly pair grids)
    "q_theilsen",
    # r7 (VERDICT r6 #3): the r6 second-batch heavies. weighted_median's
    # cumulative window runs over the (group, cent-value) grid — value-
    # range-bounded, expect ~flat; rfm is two hash aggs + one ntile
    # window over the per-customer table (grows 10x in rows, linear).
    "q_weighted_median",
    "q_rfm",
    # late r8: conformal's residual grid is micro-dollar-quantized and
    # value-range-bounded; the splits/model joins grow linearly
    "q_conformal",
]
# r5: event-stream heavies — events replicate 10x with fresh
# event/user ids over the same calendar (generate_aux), so journeys
# and series grow in NUMBER while per-user depth stays fixed.
EVENT_QUERIES = [
    # late r8: hash-permutation test — the bootstrap CPU-fan-out class
    # (rows x n_perms explode collapses map-side; shuffle carries only
    # (perm, side) partials). Expect near-linear CPU, flat-ish wall.
    "q_perm_test",
    # r6 addition over events >= 1 s at sf0.1 (quantized-value grid)
    "q_mann_whitney",
    "q_markov_attribution",
    "q_attribution",
    "q_rolling_median",
    "q_ab_cuped",
    "q_active_users",
]

# Optional narrowing for incremental runs (comma-separated query names):
# re-measuring one fixed query must not pay the full five-query sweep.
_ONLY = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _ONLY:
    only = {q.strip() for q in _ONLY.split(",")}
    DOC_QUERIES = [q for q in DOC_QUERIES if q in only]
    EMB_QUERIES = [q for q in EMB_QUERIES if q in only]
    TPCH_QUERIES = [q for q in TPCH_QUERIES if q in only]
    EVENT_QUERIES = [q for q in EVENT_QUERIES if q in only]

_CONSONANTS = "bcdfghjklmnpqrstvwxyz"


def _repl_alphabet(r: int) -> tuple[str, str]:
    """(src, dst) for F.translate: identity at r=0; otherwise vowels map to
    a replica-specific consonant window and digits rotate by r."""
    src = "aeiou0123456789"
    if r == 0:
        return src, src
    vowels_to = "".join(
        _CONSONANTS[(5 * r + j) % len(_CONSONANTS)] for j in range(5)
    )
    digits_to = "".join(str((d + r) % 10) for d in range(10))
    return src, vowels_to + digits_to


def generate(spark, out_dir: str, scale_cells: bool) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    n_docs = docs.count()
    n_vecs = emb.count()

    doc_parts = []
    emb_parts = []
    for r in range(REPLICAS):
        src, dst = _repl_alphabet(r)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        def _flip(rr):
            def fn(x, i):
                return (
                    x
                    * F.when(
                        F.pmod(F.xxhash64(F.lit(rr), i), F.lit(2)) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                ).cast("float")

            return F.transform(F.col("embedding"), fn)

        flip = _flip(r)
        label = (
            (F.col("label") + F.lit(r * 1000)).cast("int")
            if scale_cells
            else F.col("label")
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n_vecs)).alias("vec_id"),
                flip.alias("embedding"),
                label.alias("label"),
            )
        )

    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


# Key offset between replicas — far above any sf0.1 key, well inside
# int64, so replicated join keys never collide across replicas.
_KEY_OFF = 10**10


def _replicate_keyed(spark, out_dir: str, specs) -> None:
    """Union REPLICAS key-shifted copies of each (table, key_cols[,
    text_cols]) spec: join structure preserved WITHIN a replica,
    disjoint across replicas. ``text_cols`` get their digits rotated by
    the replica index — length- and structure-preserving, so name-keyed
    blocking grows in block COUNT (the realistic mode) instead of
    10x-dense identical-name blocks."""
    from pyspark.sql import functions as F

    for spec in specs:
        name, keys = spec[0], spec[1]
        text_cols = spec[2] if len(spec) > 2 else set()
        df = spark.read.parquet(f"{BASE_SF}/{name}.parquet")
        parts = []
        for r in range(REPLICAS):
            digits_to = "".join(str((d + r) % 10) for d in range(10))

            def col_of(c, rr=r, dto=digits_to):
                if c in keys:
                    return (F.col(c) + F.lit(rr * _KEY_OFF)).alias(c)
                if c in text_cols and rr > 0:
                    return F.translate(F.col(c), "0123456789", dto).alias(c)
                return F.col(c)

            parts.append(df.select(*[col_of(c) for c in df.columns]))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def generate_tpch(spark, out_dir: str) -> None:
    """Replicate orders/lineitem/customer/supplier 10x with per-replica
    key offsets; nation/region stay fixed — entity graphs don't grow
    with transaction volume."""
    _replicate_keyed(
        spark,
        out_dir,
        [
            ("orders", {"o_orderkey", "o_custkey"}),
            ("lineitem", {"l_orderkey", "l_suppkey", "l_partkey"}),
            ("customer", {"c_custkey"}, {"c_name"}),
            ("supplier", {"s_suppkey"}, {"s_name"}),
        ],
    )
    for t in ("nation", "region"):
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{BASE_SF}/{t}.parquet", link)


def generate_aux(spark, out_dir: str) -> None:
    """Replicate events and part 10x (fresh event/user/part keys, same
    time span — 10x the traffic over the same calendar, which is how an
    event stream actually grows) so the FULL headline set can run against
    the replicated corpus."""
    _replicate_keyed(
        spark,
        out_dir,
        [
            ("events", {"event_id", "user_id"}),
            ("part", {"p_partkey"}),
        ],
    )


def bench(spark, queries, sf_dir: str, n_reps: int) -> dict[str, float]:
    from alphavantage_etl_spark.queries import ALL_QUERIES

    out: dict[str, float] = {}
    for name in queries:
        best = float("inf")
        for _ in range(n_reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ALL_QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    from alphavantage_etl_spark.queries import ALL_QUERIES
    from alphavantage_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_slope")
    spark.sparkContext.setLogLevel("ERROR")
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    x1 = os.path.join(WORK, "x1")
    x10 = os.path.join(WORK, f"x{REPLICAS}")
    x10f = os.path.join(WORK, f"x{REPLICAS}_fixedcells")
    os.makedirs(x1, exist_ok=True)
    for t in (
        "documents", "embeddings",
        "orders", "lineitem", "customer", "supplier", "nation", "region",
    ):
        link = os.path.join(x1, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{BASE_SF}/{t}.parquet", link)
    if not os.path.exists(f"{x10}/embeddings.parquet/_SUCCESS"):
        generate(spark, x10, scale_cells=True)
    if not os.path.exists(f"{x10f}/embeddings.parquet/_SUCCESS"):
        # documents identical across variants: share via copy of the x10 set
        generate(spark, x10f, scale_cells=False)
    if TPCH_QUERIES and not os.path.exists(f"{x10}/lineitem.parquet/_SUCCESS"):
        generate_tpch(spark, x10)
    if EVENT_QUERIES and not os.path.exists(f"{x10}/events.parquet/_SUCCESS"):
        generate_aux(spark, x10)

    # warmup (JIT/codegen) on the smallest SF
    ALL_QUERIES["q_tfidf_terms"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    ALL_QUERIES["q_embed_near_dup"](
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    main_set = DOC_QUERIES + EMB_QUERIES + TPCH_QUERIES + EVENT_QUERIES
    results = {
        "x1": bench(spark, main_set, x1, n_reps),
        f"x{REPLICAS}": bench(spark, main_set, x10, n_reps),
        f"x{REPLICAS}_fixedcells": bench(spark, EMB_QUERIES, x10f, n_reps),
    }
    slopes = {
        name: round(results[f"x{REPLICAS}"][name] / results["x1"][name], 2)
        for name in main_set
    }
    slopes_fixed = {
        name: round(
            results[f"x{REPLICAS}_fixedcells"][name] / results["x1"][name], 2
        )
        for name in EMB_QUERIES
    }
    print(
        json.dumps(
            {
                "base_sf": BASE_SF,
                "factor": REPLICAS,
                "reps": n_reps,
                "timings": results,
                "slope_10x": slopes,
                "slope_10x_fixedcells": slopes_fixed,
            },
            indent=2,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
