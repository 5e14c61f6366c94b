#!/usr/bin/env python3
"""Full-suite 10x bench (VERDICT r4 #8): run the ENTIRE headline query
set against the 10x-replicated corpus and compare per-query wall against
a same-session 1x run.

Per-query slopes (scripts/scale_slope.py) establish that each HEAVY plan
scales; this establishes that the ENGINE scales — every headline query,
including the ones never individually slope-measured, against a corpus
10x the bench SF (sf0.1 x 10 ~ sf1), flagging any query whose 10x/1x
ratio exceeds LINEAR x 1.5 (ratio > 15 — the judge's slope-predicted
band; sub-second queries are noise-dominated and annotated, not flagged).

Replication reuses scale_slope.py's density-realistic generators
(vocabulary-translated documents, sign-flipped embeddings with cells
scaling with N, key-shifted TPC-H tables with the nation graph fixed,
key-shifted events/part). Timing protocol matches bench.py: min of
$SPARK_GRAFT_BENCH_REPS (default 1 here — the suite is 10x heavier),
clearCache between reps, noop sink.

Usage: python scripts/full_bench_x10.py   (writes under
/tmp/spark_graft_scale, prints one JSON document)
"""

from __future__ import annotations

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

import scale_slope  # noqa: E402  (shares BASE_SF/WORK/REPLICAS + generators)

FLAG_RATIO = float(os.environ.get("SPARK_GRAFT_FLAG_RATIO", "15"))
NOISE_FLOOR_SEC = 1.0  # 1x times under this are jitter-dominated


def main() -> None:
    from bench import BENCH_QUERIES
    from alphavantage_etl_spark.queries import ALL_QUERIES
    from alphavantage_etl_spark.session import get_spark

    spark = get_spark(app_name="full_bench_x10")
    spark.sparkContext.setLogLevel("ERROR")
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))

    x1 = os.path.join(scale_slope.WORK, "x1")
    x10 = os.path.join(scale_slope.WORK, f"x{scale_slope.REPLICAS}")
    os.makedirs(x1, exist_ok=True)
    for t in (
        "documents", "embeddings", "events", "part",
        "orders", "lineitem", "customer", "supplier", "nation", "region",
    ):
        link = os.path.join(x1, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{scale_slope.BASE_SF}/{t}.parquet", link)
    if not os.path.exists(f"{x10}/embeddings.parquet/_SUCCESS"):
        scale_slope.generate(spark, x10, scale_cells=True)
    if not os.path.exists(f"{x10}/lineitem.parquet/_SUCCESS"):
        scale_slope.generate_tpch(spark, x10)
    if not os.path.exists(f"{x10}/events.parquet/_SUCCESS"):
        scale_slope.generate_aux(spark, x10)

    # warmup (JIT/codegen) on the smallest SF
    ALL_QUERIES["q_agg_pricing"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    t_x1 = scale_slope.bench(spark, BENCH_QUERIES, x1, n_reps)
    t_x10 = scale_slope.bench(spark, BENCH_QUERIES, x10, n_reps)

    ratios = {
        q: round(t_x10[q] / t_x1[q], 2) if t_x1[q] > 0 else None
        for q in BENCH_QUERIES
    }
    flagged = sorted(
        q
        for q in BENCH_QUERIES
        if t_x1[q] >= NOISE_FLOOR_SEC
        and ratios[q] is not None
        and ratios[q] > FLAG_RATIO
    )
    noisy_superlinear = sorted(
        q
        for q in BENCH_QUERIES
        if t_x1[q] < NOISE_FLOOR_SEC
        and ratios[q] is not None
        and ratios[q] > FLAG_RATIO
    )
    print(
        json.dumps(
            {
                "base_sf": scale_slope.BASE_SF,
                "factor": scale_slope.REPLICAS,
                "reps": n_reps,
                "n_queries": len(BENCH_QUERIES),
                "total_x1": round(sum(t_x1.values()), 1),
                "total_x10": round(sum(t_x10.values()), 1),
                "flag_ratio": FLAG_RATIO,
                "flagged": flagged,
                "noisy_superlinear": noisy_superlinear,
                "timings_x1": t_x1,
                "timings_x10": t_x10,
                "ratios": ratios,
            },
            indent=2,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
