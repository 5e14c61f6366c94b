#!/usr/bin/env python3
"""Per-query profiling harness for the r14 optimization round.

For each named registry query: run it against $SPARK_GRAFT_SF_DIR with the
noop sink (bench protocol), and report
  - wall seconds (min of N reps, cache cleared between reps),
  - number of Spark jobs / stages / tasks the run launched (UI REST API),
  - shuffle read/write bytes summed over those stages.
Optionally dump ``explain("formatted")`` to a file.

Job/stage counts are load-independent, so this harness is also used on a
busy box to capture PLAN SHAPE while timings come from quiet-box runs.

Usage:
  python scripts/profile_query.py q_pagerank q_logreg ...
  python scripts/profile_query.py --plans-dir plans/r14 --suffix before q_pagerank
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4099"))


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def _app_id() -> str:
    return _api("applications")[0]["id"]


def _job_stage_snapshot(app: str):
    jobs = _api(f"applications/{app}/jobs")
    stages = _api(f"applications/{app}/stages")
    return jobs, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--jobs-detail",
        action="store_true",
        help="print per-job duration/description for the best rep",
    )
    args = ap.parse_args()

    from alphavantage_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_PROFILE_UI", "1")
    # Re-create get_spark's session but with the UI on so the REST API is
    # queryable. Mirrors session.py settings otherwise.
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from alphavantage_etl_spark.queries import ALL_QUERIES as QUERIES

    # Warm codegen/JIT on the smallest SF (bench protocol).
    QUERIES["q_agg_pricing"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    app = _app_id()
    out: dict[str, dict] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = float("inf")
        jobs_n = stages_n = tasks_n = 0
        sh_read = sh_write = inp = 0
        for rep in range(args.reps):
            spark.catalog.clearCache()
            j0, s0 = _job_stage_snapshot(app)
            seen_j = {j["jobId"] for j in j0}
            seen_s = {(s["stageId"], s["attemptId"]) for s in s0}
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            j1, s1 = _job_stage_snapshot(app)
            nj = [j for j in j1 if j["jobId"] not in seen_j]
            ns = [s for s in s1 if (s["stageId"], s["attemptId"]) not in seen_s]
            if args.jobs_detail:
                from datetime import datetime

                def _ms(j):
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        a = datetime.strptime(j["submissionTime"], fmt)
                        b = datetime.strptime(j["completionTime"], fmt)
                        return (b - a).total_seconds()
                    except Exception:
                        return -1.0
                for j in sorted(nj, key=lambda x: x["jobId"]):
                    print(
                        f"  rep{rep} job {j['jobId']}: {_ms(j):6.3f}s "
                        f"stages={len(j.get('stageIds', []))} "
                        f"tasks={j.get('numCompletedTasks')} "
                        f"{(j.get('description') or j.get('name') or '')[:110]}",
                        flush=True,
                    )
            if dt < best:
                best = dt
                jobs_n = len(nj)
                stages_n = len([s for s in ns if s["status"] != "SKIPPED"])
                tasks_n = sum(s.get("numCompleteTasks", 0) for s in ns)
                sh_read = sum(s.get("shuffleReadBytes", 0) for s in ns)
                sh_write = sum(s.get("shuffleWriteBytes", 0) for s in ns)
                inp = sum(s.get("inputBytes", 0) for s in ns)
        out[name] = {
            "sec": round(best, 3),
            "jobs": jobs_n,
            "stages": stages_n,
            "tasks": tasks_n,
            "shuffle_read_mb": round(sh_read / 2**20, 2),
            "shuffle_write_mb": round(sh_write / 2**20, 2),
            "input_mb": round(inp / 2**20, 2),
        }
        print(name, json.dumps(out[name]), flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "queries": out}, fh, indent=1)
    print(json.dumps({"total": round(sum(v["sec"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
