"""Reference-shape integration test (SURVEY.md section 5.2 layer 3): run the
full ETL pipeline against a writable parquet sink, assert the derived table
equals a DuckDB-computed golden, and prove idempotency + true incrementality
of the watermark/anti-join protocol."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.plans.etl import (
    PRD,
    SRC_FX,
    SRC_PX,
    run_etl,
    with_retry,
)

from .conftest import SF_SMALL

GOLDEN_PRD = """
WITH px AS (
  SELECT CAST(o_orderdate AS DATE) AS date,
         arg_max(o_totalprice, o_orderkey) AS close_price_usd
  FROM '{sf}/orders.parquet' GROUP BY 1
),
fx AS (
  SELECT CAST(l_shipdate AS DATE) AS date,
         arg_max(l_discount, l_orderkey * 10 + l_linenumber) AS close_rate
  FROM '{sf}/lineitem.parquet' GROUP BY 1
)
SELECT px.date, close_price_usd, close_rate,
       round_even(close_price_usd * close_rate, 2) AS close_price_fx
FROM px JOIN fx USING (date)
"""


@pytest.fixture(scope="module")
def sink(tmp_path_factory):
    return str(tmp_path_factory.mktemp("etl_sink"))


def test_first_run_loads_everything(spark, sink):
    appended = run_etl(spark, SF_SMALL, sink)
    assert appended[SRC_PX] > 0 and appended[SRC_FX] > 0 and appended[PRD] > 0

    got = {
        r["date"]: (r["close_price_usd"], r["close_rate"], r["close_price_fx"])
        for r in spark.read.parquet(f"{sink}/{PRD}").collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(GOLDEN_PRD.format(sf=SF_SMALL)).fetchall()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0] and got[d][1] == want[d][1]
        # money_round is numpy-parity (scaled rint); DuckDB round_even agrees
        # on cents ties — pinned more precisely in test_semantics.py
        assert got[d][2] == pytest.approx(want[d][2], abs=0.011)


def test_rerun_is_idempotent(spark, sink):
    before = spark.read.parquet(f"{sink}/{PRD}").count()
    appended = run_etl(spark, SF_SMALL, sink)
    assert appended == {SRC_PX: 0, SRC_FX: 0, PRD: 0}
    after = spark.read.parquet(f"{sink}/{PRD}").count()
    assert after == before
    dups = (
        spark.read.parquet(f"{sink}/{SRC_PX}")
        .groupBy("date").count().where(F.col("count") > 1).count()
    )
    assert dups == 0


def test_incremental_appends_only_new_dates(spark, sink, tmp_path):
    # Simulate the next scheduled run seeing more history: a second sink
    # seeded from a truncated copy of the fixtures would need fixture
    # surgery; instead verify the protocol directly — drop the newest 30
    # dates from a FRESH sink's src tables, rerun, and confirm exactly the
    # missing dates (and only those) are appended.
    sink2 = str(tmp_path / "sink2")
    run_etl(spark, SF_SMALL, sink2)

    full = spark.read.parquet(f"{sink2}/{SRC_PX}")
    cutoff = full.agg(F.date_sub(F.max("date"), 30).alias("c")).first()["c"]
    truncated = full.where(F.col("date") <= F.lit(cutoff))
    n_dropped = full.count() - truncated.count()
    assert n_dropped > 0

    sink3 = str(tmp_path / "sink3")
    truncated.write.parquet(f"{sink3}/{SRC_PX}")
    appended = run_etl(spark, SF_SMALL, sink3)
    assert appended[SRC_PX] == n_dropped
    assert (
        spark.read.parquet(f"{sink3}/{SRC_PX}").count() == full.count()
    ), "sink must converge to full history with no duplicates"


# --- ST3: retry policy (av_etl.py:138's @retry(Exception, tries=5, delay=1))


def test_with_retry_recovers_and_is_bounded():
    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky, tries=5, delay=1.0, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3 and sleeps == [1.0, 1.0]

    with pytest.raises(RuntimeError, match="always"):
        with_retry(
            lambda: (_ for _ in ()).throw(RuntimeError("always")),
            tries=3,
            delay=0.5,
            sleep=sleeps.append,
        )
    assert sleeps == [1.0, 1.0, 0.5, 0.5], "last failure must not sleep again"


def test_retried_pipeline_output_identical_after_midrun_failure(spark, tmp_path):
    # A transient fault AFTER a partial append (src tables written, derived
    # refresh not) must converge to the clean-run result on retry — the
    # anti-join guard turns the replayed appends into 0-row no-ops.
    clean_sink = str(tmp_path / "clean")
    run_etl(spark, SF_SMALL, clean_sink)

    flaky_sink = str(tmp_path / "flaky")
    attempt = {"n": 0}

    def flaky_run():
        attempt["n"] += 1
        if attempt["n"] == 1:
            run_etl(spark, SF_SMALL, flaky_sink)  # full work happens...
            raise RuntimeError("transient fault after append")  # ...then dies
        return run_etl(spark, SF_SMALL, flaky_sink)

    appended = with_retry(flaky_run, tries=5, delay=1.0, sleep=lambda _: None)
    assert appended == {SRC_PX: 0, SRC_FX: 0, PRD: 0}, "retry must append nothing"
    for table in (SRC_PX, SRC_FX, PRD):
        got = sorted(map(tuple, spark.read.parquet(f"{flaky_sink}/{table}").collect()))
        want = sorted(map(tuple, spark.read.parquet(f"{clean_sink}/{table}").collect()))
        assert got == want, f"{table} diverged after retried run"


def test_append_is_single_action_no_count(spark, tmp_path, monkeypatch):
    """The appended-row count must come from df.observe during the write,
    not a separate count() action — a count-then-write scans the incoming
    batch (and the sink's key projection) twice per table per run."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("DataFrame.count() called inside run_etl")

    monkeypatch.setattr(DataFrame, "count", _boom)
    appended = run_etl(spark, SF_SMALL, str(tmp_path / "sink"))
    assert appended[SRC_PX] > 0 and appended[SRC_FX] > 0 and appended[PRD] > 0
