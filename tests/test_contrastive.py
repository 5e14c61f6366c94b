"""Unit semantics for contrastive data prep (operators/contrastive.py):
two-phase global ranking and ring negative sampling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.contrastive import (
    content_ranked_positions,
    sample_negatives,
)


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


def test_positions_match_python_sort_and_are_dense(spark):
    n = 500
    got = {
        r["id"]: r["pos"]
        for r in content_ranked_positions(_ids(spark, n), "id").collect()
    }
    order = sorted(
        range(n), key=lambda i: (hashlib.md5(f"ring0:{i}".encode()).hexdigest(), i)
    )
    want = {i: p for p, i in enumerate(order)}
    assert got == want  # exact dense 0..N-1 ranks of the total order
    assert sorted(got.values()) == list(range(n))


def test_positions_partitioning_invariant_no_single_partition(spark):
    df = _ids(spark, 300)
    a = sorted(content_ranked_positions(df, "id").collect())
    b = sorted(content_ranked_positions(df.repartition(7), "id").collect())
    assert a == b
    plan = (
        content_ranked_positions(df, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the data-sized window partitions on the bucket byte; only the
    # 256-row size table may see a SinglePartition exchange
    assert "Exchange SinglePartition" not in plan.split("__c")[0]


def test_negatives_exclude_pairs_and_self(spark):
    ids = _ids(spark, 100)
    # exclude every pair involving id 0 as a partner of ids 1..99 is too
    # big; exclude a planted set and check none of them appear
    excl = spark.createDataFrame(
        [(i, (i * 7) % 100) for i in range(50)], "id_a long, id_b long"
    ).where(F.col("id_a") != F.col("id_b"))
    out = sample_negatives(ids, "id", k=3, exclusions=excl).collect()
    banned = set()
    for r in excl.collect():
        banned.add((r["id_a"], r["id_b"]))
        banned.add((r["id_b"], r["id_a"]))
    for r in out:
        assert r["anchor_id"] != r["negative_id"]
        assert (r["anchor_id"], r["negative_id"]) not in banned
    # slots run 1..k per anchor, deterministic
    per_anchor: dict = {}
    for r in out:
        per_anchor.setdefault(r["anchor_id"], []).append(r["slot"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_anchor.values())
    assert all(len(v) <= 3 for v in per_anchor.values())


def test_negatives_deterministic_across_layouts(spark):
    ids = _ids(spark, 80)
    a = sorted(map(tuple, sample_negatives(ids, "id", k=2).collect()))
    b = sorted(
        map(tuple, sample_negatives(ids.repartition(9), "id", k=2).collect())
    )
    assert a == b and len(a) == 160
