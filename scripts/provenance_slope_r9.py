#!/usr/bin/env python3
"""10x scale slope for the r9 provenance chain (X119-X122 composed).

Runs license_gate |> canonicalize+url_dedup |> domain_caps |>
token_budget_per_domain as ONE plan over the sf0.1 documents corpus
(5k docs) and the 10x replicated corpus (50k docs, built by
scripts/scale_slope.py). The fixture domains are deliberately skewed —
two hub domains hold 3/4 of the corpus — so the hot-domain path the
candidate pruning exists for is the path being measured: at 10x the
hub domains hold ~19k docs each, and a naive per-domain sort would
grow with them while the pruned window input stays O(slack*cap).

Wall covers the full chain to a noop sink (scan -> gate -> canon ->
dedup agg -> caps -> budget), min of 2 warm reps, frames rebuilt per
rep (reusing a DataFrame across reps skips shuffle stages — the
invalid-timing trap). Prints one JSON document.

Usage: python scripts/provenance_slope_r9.py
(expects /tmp/spark_graft_scale/x10 from scripts/scale_slope.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X1_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10_DIR = "/tmp/spark_graft_scale/x10"


def chain(spark, sf_dir):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.provenance import (
        domain_caps,
        license_gate,
        token_budget_per_domain,
        url_dedup,
    )
    from alphavantage_etl_spark.sources import load

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    did = F.col("doc_id")
    lic = (
        F.when(did % 5 == 0, F.lit("cc-by"))
        .when(did % 5 == 1, F.lit("cc-by-sa"))
        .when(did % 5 == 2, F.lit("cc0"))
        .when(did % 5 == 3, F.lit("all-rights-reserved"))
        .otherwise(F.lit("noai"))
    )
    dom = F.when(
        did % 4 < 3,
        F.concat(F.lit("hub-"), (did % 2).cast("string"), F.lit(".example.com")),
    ).otherwise(F.concat(F.col("source"), F.lit(".example.org")))
    url = F.concat(
        F.when(did % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP")),
        F.lit("://"),
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        dom,
        F.lit("/page/"),
        did.cast("string"),
        F.when(did % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    gated = license_gate(
        d.withColumn("license", lic)
        .withColumn("robots_noai", did % 11 == 0)
        .withColumn("domain", dom)
        .withColumn("url", url),
        "license",
        ["cc-by", "cc-by-sa", "cc0"],
        robots_col="robots_noai",
    )
    # URL dedup keyed on the canonical address (distinct per doc here, so
    # it exercises the full-width agg), then re-derive the domain and cap.
    deduped = url_dedup(gated, "url", "n_chars", "doc_id")
    dom2 = F.regexp_extract(F.col("canon_url"), r"://([^/]*)/", 1)
    capped = domain_caps(
        deduped.withColumn("domain", dom2), "domain", "doc_id", cap=100
    )
    return token_budget_per_domain(
        capped.select("doc_id", "domain", "n_chars"),
        "domain",
        "doc_id",
        "n_chars",
        budget=30_000,
    )


def measure(spark, sf_dir, reps=2):
    best = None
    n_out = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t = time.time()
        out = chain(spark, sf_dir)
        out.write.format("noop").mode("overwrite").save()
        w = time.time() - t
        best = w if best is None else min(best, w)
        if n_out is None:
            n_out = chain(spark, sf_dir).count()
    return best, n_out


def main():
    from alphavantage_etl_spark.session import get_spark

    spark = get_spark(app_name="provenance_slope")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.format("noop").mode("overwrite").save()  # warm
    w1, n1 = measure(spark, X1_DIR)
    w10, n10 = measure(spark, X10_DIR)
    print(
        json.dumps(
            {
                "x1_wall_s": round(w1, 2),
                "x10_wall_s": round(w10, 2),
                "wall_ratio_10x_data": round(w10 / w1, 2),
                "x1_rows_out": n1,
                "x10_rows_out": n10,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
