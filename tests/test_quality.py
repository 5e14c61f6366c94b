"""Data-quality expectation gate: planted violations must be caught, clean
frames must pass, and every row-level check rides ONE aggregate job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.plans.quality import (
    Checks,
    QualityCheckError,
    enforce,
    run_checks,
)
from alphavantage_etl_spark.sources import load

from .conftest import SF_SMALL


def test_clean_fixture_passes_all_checks(spark):
    li = load(spark, SF_SMALL, "lineitem")
    orders = load(spark, SF_SMALL, "orders")
    report = run_checks(
        li,
        Checks(
            complete=["l_orderkey", "l_quantity", "l_shipdate"],
            ranges=[("l_quantity", 0.0, 1e6), ("l_discount", 0.0, 1.0)],
            references=[("l_orderkey", orders, "o_orderkey")],
        ),
    )
    assert enforce(report) is report
    assert report["__rows"]["observed"] == li.count()
    # orders' PK is genuinely unique in the fixture
    ok = run_checks(orders, Checks(unique=[["o_orderkey"]]))
    assert ok["unique:o_orderkey"]["ok"]
    # ...and the synthetic lineitem VIOLATES the TPC-H composite key
    # (1161 duplicate pairs at sf0.001) — the gate catches real drift,
    # not just planted toys
    drift = run_checks(li, Checks(unique=[["l_orderkey", "l_linenumber"]]))
    assert not drift["unique:l_orderkey,l_linenumber"]["ok"]


def test_planted_violations_each_caught(spark):
    rows = [
        (1, 10.0, "AA"),
        (2, -5.0, "AB"),      # range violation
        (2, 3.0, "zz"),       # dup key + pattern violation
        (4, None, "AC"),      # null amount
    ]
    df = spark.createDataFrame(rows, "id long, amount double, code string")
    dim = spark.createDataFrame([(1,), (2,)], "id long")  # 4 is an orphan
    report = run_checks(
        df,
        Checks(
            complete=["amount"],
            min_completeness=1.0,
            ranges=[("amount", 0.0, 100.0)],
            patterns=[("code", "^[A-Z]{2}$")],
            unique=[["id"]],
            references=[("id", dim, "id")],
        ),
    )
    bad = {k for k, v in report.items() if not v["ok"]}
    assert bad == {
        "complete:amount",
        "range:amount[0.0,100.0]",
        "pattern:code",
        "unique:id",
        "ref:id->id",
    }
    with pytest.raises(QualityCheckError) as e:
        enforce(report)
    assert sorted(e.value.failures) == sorted(bad)
    # thresholds: 3/4 completeness passes at 0.75
    r2 = run_checks(df, Checks(complete=["amount"], min_completeness=0.75))
    assert r2["complete:amount"]["ok"]


def test_row_level_checks_are_one_job(spark):
    """All row-level expectations compile into a single aggregate: the
    planned scan count over the input must be 1."""
    li = load(spark, SF_SMALL, "lineitem")
    checks = Checks(
        complete=["l_orderkey", "l_quantity", "l_discount", "l_shipdate"],
        ranges=[("l_quantity", 0.0, 1e6), ("l_discount", 0.0, 1.0)],
        patterns=[("l_returnflag", "^[ANR]$")],
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    # mirror run_checks' plan without executing twice: one agg -> one scan
    plan = (
        li.agg(
            *aggs,
            *[F.count(F.col(c)).alias(f"nn_{c}") for c in checks.complete],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1


def test_etl_validate_blocks_before_publish(spark, tmp_path):
    """run_etl(validate=True): clean fixtures publish normally; a frame
    violating the gate raises BEFORE any sink write."""
    from alphavantage_etl_spark.plans.etl import run_etl

    sink = str(tmp_path / "sink_ok")
    appended = run_etl(spark, SF_SMALL, sink, validate=True)
    assert all(v > 0 for v in appended.values())


def test_streaming_observer_reports_batch_metrics(spark, tmp_path):
    """observe_quality rides the micro-batch plan: the progress's
    observedMetrics row converts into the same report run_checks yields
    for row-level checks, per batch, with no extra scan."""
    from alphavantage_etl_spark.plans.quality import (
        observe_quality,
        report_from_metrics,
    )
    from alphavantage_etl_spark.streaming.pipeline import read_events_stream

    d = tmp_path / "ev"
    d.mkdir()
    import glob as _glob
    import shutil

    stage = tmp_path / "stage"
    load(spark, SF_SMALL, "events").limit(500).coalesce(1).write.parquet(
        str(stage)
    )
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], str(d / "b1.parquet"))

    checks = Checks(
        complete=["event_id", "ts"],
        ranges=[("value", -1e9, 1e9)],
        patterns=[("event_type", "^[a-z_]+$")],
    )
    stream = observe_quality(read_events_stream(spark, str(d)), checks)
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    metrics = next(
        p.observedMetrics["quality"]
        for p in q.recentProgress
        if "quality" in (p.observedMetrics or {})
    )
    report = report_from_metrics(metrics, checks)
    assert report["__rows"]["observed"] == 500
    assert report["complete:event_id"]["ok"] and report["pattern:event_type"]["ok"]
    # parity with the batch gate over the same rows
    batch = run_checks(spark.read.parquet(str(d)), checks)
    for k, v in report.items():
        assert batch[k]["observed"] == v["observed"], k


# --------------------------------------------------------- table profile
def test_profile_table_stats_and_native_ordering(spark):
    from alphavantage_etl_spark.plans.quality import profile_table

    df = spark.createDataFrame(
        [(9, "b"), (10, None), (9, "a"), (None, "a")],
        "x int, s string",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["x"]["n_rows"] == 4
    assert out["x"]["n_null"] == 1 and out["s"]["n_null"] == 1
    assert out["x"]["n_distinct"] == 2 and out["s"]["n_distinct"] == 2
    # NATIVE ordering before stringify: 9 < 10 numerically (a string
    # min/max would claim "10" < "9")
    assert out["x"]["min_value"] == "9" and out["x"]["max_value"] == "10"
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"


def test_profile_table_one_scan(spark):
    from alphavantage_etl_spark.plans.quality import profile_table
    from alphavantage_etl_spark.sources import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        profile_table(d, ["doc_id", "lang", "source"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1  # all columns, one pass
    assert "Expand" in plan  # the multi-distinct strategy


def test_profile_table_rejects_empty_columns(spark):
    import pytest as _pytest

    from alphavantage_etl_spark.plans.quality import profile_table

    with _pytest.raises(ValueError):
        profile_table(spark.range(1), [])


def test_corpus_digest_order_independent_and_change_sensitive(spark):
    from alphavantage_etl_spark.plans.quality import corpus_digest

    rows = [(1, "alpha"), (2, "beta"), (3, None)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string")
    ra = corpus_digest(a, ["doc_id", "text"]).first()
    rb = corpus_digest(b.repartition(7), ["doc_id", "text"]).first()
    assert ra["digest"] == rb["digest"]  # order/partitioning independent
    assert ra["n_rows"] == 3 and ra["n_distinct"] == 3

    # any single-cell change moves the digest
    c = spark.createDataFrame(
        [(1, "alpha"), (2, "beta!"), (3, None)], "doc_id long, text string"
    )
    assert corpus_digest(c, ["doc_id", "text"]).first()["digest"] != ra["digest"]
    # NULL and empty string are distinct contents
    d = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "")], "doc_id long, text string"
    )
    assert corpus_digest(d, ["doc_id", "text"]).first()["digest"] != ra["digest"]


def test_shard_balance_excludes_null_ids(spark):
    """ADVICE r7: concat_ws silently drops a NULL id, so an unfiltered
    NULL id would hash md5('shard') into a REAL bucket while a SQL
    oracle's concat yields a NULL bucket — phantom cell, engine
    divergence. Contract ('NULL ids / sizes are excluded'): output with
    NULL-id rows == output without them."""
    from alphavantage_etl_spark.plans.quality import shard_balance

    clean = spark.createDataFrame(
        [(f"d{i}", i % 7 + 1) for i in range(60)], "id string, sz long"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, 999), (None, 5)], "id string, sz long"
        )
    )
    want = clean.transform(lambda d: shard_balance(d, "id", "sz")).first()
    got = dirty.transform(lambda d: shard_balance(d, "id", "sz")).first()
    assert got == want
    assert got["n_rows"] == 60
