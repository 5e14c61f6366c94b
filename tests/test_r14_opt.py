"""Focused pins for the r14 optimization round's operator-internal
changes — each test locks an equivalence or branch the optimization
relies on, so a later regression is caught at the operator, not the
oracle.

Covered here:
- ``bq_index`` fused one-projection build ≡ the ``assign_cells_l2q ⋈
  bq_encode`` composition it replaced (phase 3).
- ``random_projection(dim=)`` codegen fast path ≡ the HOF form,
  including ragged/NULL rows that must take the fallback branch
  (phase 4).
- ``connected_components`` small-model exchange-free sweeps ≡ the
  general path (phase 7), forced via ``spark.graft.modelLoopRows``.
- ``ngram_contamination``'s exact bench-size probe flips to broadcast
  when the file-level probe over-counts a filtered benchmark (phase 7).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_bq_index_equals_assign_join_encode(spark):
    from alphavantage_etl_spark.operators.similarity import (
        assign_cells_l2q,
        bq_encode,
        bq_fit,
        bq_index,
    )
    from alphavantage_etl_spark.queries import _learned_cents_shared
    from alphavantage_etl_spark.sources import load

    emb = load(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") % 25 != 7)
    cents6 = _learned_cents_shared(spark, SF_ORACLE)
    sums6, n_fit = bq_fit(corpus, dim=64)
    fused = bq_index(corpus, cents6, sums6, n_fit)
    composed = assign_cells_l2q(corpus, cents6, n_probe=1).join(
        bq_encode(corpus, sums6, n_fit), on="vec_id"
    )
    a = {r["vec_id"]: (r["__cell"], list(r["__bits"])) for r in fused.collect()}
    b = {
        r["vec_id"]: (r["__cell"], list(r["__bits"]))
        for r in composed.collect()
    }
    assert a == b and len(a) > 0


def test_random_projection_dim_fast_path_bit_identical(spark):
    from alphavantage_etl_spark.functions.vectors import random_projection

    rng = random.Random(14)
    rows = [
        (i, [rng.uniform(-2.0, 2.0) for _ in range(16)]) for i in range(200)
    ]
    rows.append((900, [0.5, -0.25]))  # ragged: must take the HOF branch
    rows.append((901, None))  # NULL vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    slow = random_projection(df, "embedding", "vec_id", out_dims=4)
    fast = random_projection(df, "embedding", "vec_id", out_dims=4, dim=16)
    a = {r["vec_id"]: tuple(r[f"p{j}"] for j in range(4)) for r in slow.collect()}
    b = {r["vec_id"]: tuple(r[f"p{j}"] for j in range(4)) for r in fast.collect()}
    assert a == b and len(a) == 202


def test_connected_components_small_model_path_identical(spark):
    from alphavantage_etl_spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    key = "spark.graft.modelLoopRows"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "0")  # force the general (multi-partition) path
        big = {
            r["node"]: r["cluster"]
            for r in connected_components(df, "id_a", "id_b").collect()
        }
        spark.conf.set(key, "262144")  # the exchange-free single-task path
        small = {
            r["node"]: r["cluster"]
            for r in connected_components(df, "id_a", "id_b").collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert big == small and len(big) > 0


def test_contamination_exact_probe_flips_filtered_bench_to_broadcast(
    spark, tmp_path
):
    from alphavantage_etl_spark.operators.contamination import (
        ngram_contamination,
    )

    # a parquet-backed table whose FILE is large relative to the filtered
    # benchmark slice: the file-level probe (bytes * 32) must decline
    # while the exact gram-count probe accepts
    rows = [(i, ("doc %d " % i) + "x" * 400) for i in range(400)]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(p)
    d = spark.read.parquet(p)
    bench = d.where(F.col("doc_id") % 97 == 0)  # 5 docs
    corp = d.where(F.col("doc_id") % 97 != 0)
    import os

    file_bytes = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    # between the exact-probe estimate (~5 docs * ~410 grams * 48B) and
    # the file-level estimate (file_bytes * 32) — asserts the setup holds
    max_bytes = 300_000
    assert file_bytes * 32 > max_bytes > 5 * 410 * 48
    out = ngram_contamination(
        corp, bench, "text", "doc_id", k=8, threshold=0.05,
        broadcast_max_bytes=max_bytes,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "SortMergeJoin" not in final
    assert "BroadcastHashJoin" in final or "BroadcastExchange" in plan
