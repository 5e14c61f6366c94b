#!/usr/bin/env python3
"""10x scale slope for the r10 MERGE upsert (X131) and CDC apply (X132).

Replicates the sf0.1 orders table 10x with fresh key ranges (replica r
shifts keys by r * 10^7 — partition values o_part = key % 10 are
preserved, so the partition-scoped split sees the same layout at both
scales), then runs the q_upsert_merge composition (source slices ->
upsert_merge -> per-partition cents fingerprint) and the q_cdc_apply
composition (ordered changelog -> max_by net reduction -> apply) on
x1 vs x10.

Linear expectation: the target flows through one broadcast anti-join +
one agg; the source delta grows with the data (it is a fixed fraction
of keys), so wall should grow ~linearly with a flat per-row cost —
the claim under test.

Wall = full plan to a noop sink, min of 2 warm reps, frames rebuilt per
rep (the invalid-timing trap). Prints one JSON document.

Usage: python scripts/upsert_slope_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X1_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_scale/orders_x10"
REPLICAS = 10


def build_x10(spark):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.sources import load

    if os.path.exists(os.path.join(WORK, "_SUCCESS")):
        return
    base = load(spark, X1_DIR, "orders").select("o_orderkey", "o_totalprice")
    reps = None
    for r in range(REPLICAS):
        # key shift is a multiple of 10: o_part = key % 10 is preserved
        shifted = base.select(
            (F.col("o_orderkey") + F.lit(r * 10_000_000)).alias("o_orderkey"),
            (F.col("o_totalprice") + F.lit(float(r))).alias("o_totalprice"),
        )
        reps = shifted if reps is None else reps.unionByName(shifted)
    reps.write.mode("overwrite").parquet(WORK)


def merge_plan(spark, orders_df):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.evolution import upsert_merge

    key = F.col("o_orderkey")
    base = orders_df.withColumn("o_part", (key % 10).cast("long"))
    upd = base.where(key % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        "o_part",
        F.lit(False).alias("is_del"),
    )
    ins = base.where(key % 13 == 3).select(
        (key + F.lit(100_000_000)).alias("o_orderkey"),
        F.lit(1.5).alias("o_totalprice"),
        "o_part",
        F.lit(False).alias("is_del"),
    )
    dels = base.where((key % 11 == 5) & (key % 7 != 0)).select(
        "o_orderkey", "o_totalprice", "o_part", F.lit(True).alias("is_del")
    )
    src = upd.unionByName(ins).unionByName(dels)
    post = upsert_merge(
        base, src, ["o_orderkey"], delete_col="is_del", partition_col="o_part"
    )
    return (
        post.groupBy("o_part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents_sum"
            ),
        )
    )


def cdc_plan(spark, orders_df):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.evolution import apply_changelog

    key = F.col("o_orderkey")
    base = orders_df.withColumn("o_part", (key % 10).cast("long"))

    def ev(pred, price, seq, op, newkey=None):
        return base.where(pred).select(
            (key + F.lit(newkey) if newkey else key).alias("o_orderkey"),
            price.alias("o_totalprice"),
            "o_part",
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
        )

    changes = (
        ev(key % 7 == 0, F.col("o_totalprice") + F.lit(5.0), 1, "U")
        .unionByName(ev(key % 14 == 0, F.lit(0.0), 2, "D"))
        .unionByName(ev(key % 28 == 0, F.lit(77.0), 3, "U"))
        .unionByName(
            ev(key % 17 == 2, F.lit(2.5), 1, "I", newkey=200_000_000)
        )
    )
    post = apply_changelog(base, changes, ["o_orderkey"], "seq", "op")
    return (
        post.groupBy("o_part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents_sum"
            ),
        )
    )


def bt_plan(spark, orders_df):
    """X133 over the replicated keys: the corpus-width stage is ONE
    map-side agg onto the 240-cell pair grid; the 10 MM iterations are
    grid-bounded and data-independent."""
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.preference import (
        bradley_terry_strengths,
        pairwise_win_grid,
    )

    key = F.col("o_orderkey")
    cmp_ = orders_df.select(
        (key % 16).alias("item_a"),
        ((key / 16).cast("long") % 16).alias("item_b"),
        (key % 100).alias("h"),
    ).where(F.col("item_a") != F.col("item_b"))
    lo = F.least(F.col("item_a"), F.col("item_b"))
    hi = F.greatest(F.col("item_a"), F.col("item_b"))
    hi_wins = F.col("h") < F.least(F.lit(50) + (hi - lo) * 3, F.lit(90))
    a_wins = F.when(F.col("item_a") == hi, hi_wins).otherwise(~hi_wins)
    grid = pairwise_win_grid(
        cmp_.withColumn("a_wins", a_wins), "item_a", "item_b", "a_wins"
    )
    return bradley_terry_strengths(grid, iters=10)


def measure(spark, plan_fn, loader, reps=2):
    best = None
    n_out = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t = time.time()
        out = plan_fn(spark, loader())
        out.write.format("noop").mode("overwrite").save()
        w = time.time() - t
        best = w if best is None else min(best, w)
        if n_out is None:
            n_out = plan_fn(spark, loader()).count()
    return best, n_out


def main():
    from alphavantage_etl_spark.session import get_spark
    from alphavantage_etl_spark.sources import load

    spark = get_spark(app_name="upsert_slope")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.format("noop").mode("overwrite").save()  # warm
    build_x10(spark)

    def x1():
        return load(spark, X1_DIR, "orders").select(
            "o_orderkey", "o_totalprice"
        )

    def x10():
        return spark.read.parquet(WORK)

    out = {}
    for name, plan_fn in [
        ("upsert_merge", merge_plan),
        ("cdc_apply", cdc_plan),
        ("bradley_terry", bt_plan),
    ]:
        w1, n1 = measure(spark, plan_fn, x1)
        w10, n10 = measure(spark, plan_fn, x10)
        out[name] = {
            "x1_wall_s": round(w1, 2),
            "x10_wall_s": round(w10, 2),
            "wall_ratio_10x_data": round(w10 / w1, 2),
            "x1_parts_out": n1,
            "x10_parts_out": n10,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
