"""Hand-value unit tests for the r7 operator families (X101-X107)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ X101 CUSUM chart
def test_cusum_accumulates_shift_and_resets(spark):
    """Hand-checked one-sided accumulation: flat series -> C+ = C- != 0
    only via slack; a step shift accumulates in C+ linearly; the
    running-minimum linearization must equal the max(0, ...) fold."""
    from datetime import date, timedelta

    from alphavantage_etl_spark.operators.anomaly import cusum_chart

    # 10 days at 100.00 then 10 days at 110.00, one group
    rows = [
        ("g", date(2020, 1, 1) + timedelta(days=i), 100.0 if i < 10 else 110.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, ts date, v double")
    out = {
        r["date"]: r
        for r in cusum_chart(
            df, "ts", "v", "g", slack_pct=5, h_sigmas=4.0
        ).collect()
    }
    # reference fold in python: mu = 105, K = 5.25
    mu, k = 105.0, 5.25
    cp = cn = 0.0
    for i in range(20):
        x = 100.0 if i < 10 else 110.0
        cp = max(0.0, cp + x - (mu + k))
        cn = max(0.0, cn + (mu - k) - x)
        d = date(2020, 1, 1) + timedelta(days=i)
        assert out[d]["cusum_pos"] == pytest.approx(cp, abs=1e-9), (i, cp)
        assert out[d]["cusum_neg"] == pytest.approx(cn, abs=1e-9), (i, cn)

    # slack_pct bounds
    with pytest.raises(ValueError):
        cusum_chart(df, "ts", "v", "g", slack_pct=101)


def test_cusum_breach_on_sustained_small_shift(spark):
    """A sustained small shift (well under any single-day z fence)
    must breach the CUSUM decision interval, while a no-drift control
    series of the same day-to-day noise never breaches. The target is
    the GLOBAL series mean, so the shifted series accumulates on BOTH
    sides of the blended mean — C- in the low regime, C+ in the high
    one."""
    from datetime import date, timedelta

    from alphavantage_etl_spark.operators.anomaly import cusum_chart

    def series(g, shift):
        return [
            (g, date(2020, 1, 1) + timedelta(days=i),
             100.0 + (1.0 if i % 2 else -1.0) + (shift if i >= 40 else 0.0))
            for i in range(80)
        ]

    df = spark.createDataFrame(
        series("control", 0.0) + series("shifted", 3.0),
        "g string, ts date, v double",
    )
    out = cusum_chart(df, "ts", "v", "g", slack_pct=1, h_sigmas=4.0)
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["g"], []).append(r)
    control = sorted(by_g["control"], key=lambda r: r["date"])
    shifted = sorted(by_g["shifted"], key=lambda r: r["date"])
    assert not any(r["is_breach"] for r in control)
    assert any(r["is_breach"] and r["cusum_neg"] > 0 for r in shifted[:40])
    assert any(r["is_breach"] and r["cusum_pos"] > 0 for r in shifted[40:])


# ------------------------------------------------ X102 Kruskal-Wallis
def test_kruskal_matches_scipy_hand_value(spark):
    """Three small samples, checked against the published formula
    (scipy.stats.kruskal reference values, tie-corrected)."""
    from alphavantage_etl_spark.functions.distribution import kruskal_wallis

    a = [2.9, 3.0, 2.5, 2.6, 3.2]
    b = [3.8, 2.7, 4.0, 2.4]
    c = [2.8, 3.4, 3.7, 2.2, 2.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", v) for v in c]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").first()
    assert r["n_groups"] == 3 and r["n"] == 14 and r["dof"] == 2
    # scipy.stats.kruskal(a, b, c) -> H = 0.7714285714285715 (no ties)
    assert r["h_corrected"] == pytest.approx(0.7714285714, abs=1e-6)


def test_kruskal_identical_groups_and_grid_bound(spark):
    from alphavantage_etl_spark.functions.distribution import kruskal_wallis

    rows = [("a", float(i)) for i in range(10)] + [
        ("b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").first()
    # identical samples: H ~ 0 (exactly 0 up to the term flooring)
    assert abs(r["h_corrected"]) < 1e-6

    # the r8 lazy in-plan guard raises at ACTION time as a Spark
    # runtime error (assert_true), no longer a driver-side ValueError
    with pytest.raises(Exception, match="max_grid"):
        kruskal_wallis(df, "g", "v", max_grid=5).first()


# ------------------------------------------------ X103 Spearman
def test_spearman_monotone_and_reversed(spark):
    from alphavantage_etl_spark.operators.trend import spearman_corr

    rows = [("g", float(i), float(i * i), i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double, tb long")
    r = spearman_corr(df, "g", "x", "y", "tb").first()
    assert r["rho"] == 1.0 and r["d2_sum"] == 0  # monotone nonlinear

    rows = [("g", float(i), float(-i), i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double, tb long")
    assert spearman_corr(df, "g", "x", "y", "tb").first()["rho"] == -1.0

    # n = 1: NULL rho
    one = spark.createDataFrame(
        [("g", 1.0, 1.0, 1)], "g string, x double, y double, tb long"
    )
    assert spearman_corr(one, "g", "x", "y", "tb").first()["rho"] is None


# ------------------------------------------------ X104 burstiness
def test_burstiness_periodic_vs_bursty(spark):
    from datetime import datetime, timedelta

    from alphavantage_etl_spark.operators.sessionize import burstiness

    t0 = datetime(2020, 1, 1)
    # periodic: constant 60 s gaps -> sigma = 0 -> B = -1
    periodic = [
        ("p", 1, t0 + timedelta(seconds=60 * i), i) for i in range(20)
    ]
    # bursty: 5 quick events then a huge gap, repeated
    bursty, ts = [], t0
    for i in range(20):
        ts = ts + timedelta(seconds=(1 if i % 5 else 3600))
        bursty.append(("b", 1, ts, 100 + i))
    df = spark.createDataFrame(
        periodic + bursty, "g string, u long, ts timestamp, tb long"
    )
    out = {r["g"]: r for r in burstiness(df, "g", "u", "ts", "tb").collect()}
    assert out["p"]["burstiness"] == pytest.approx(-1.0)
    assert out["p"]["mean_gap_s"] == 60.0
    # well above Poisson (B = 0); the 4-quick-then-gap cadence lands ~0.39
    assert out["b"]["burstiness"] > 0.3


# ------------------------------------------------ X105 NDCG@k
def test_ndcg_perfect_and_inverted_ranking(spark):
    from alphavantage_etl_spark.operators.evaluation import ndcg_at_k

    rels = spark.createDataFrame(
        [("q", "d1", 3), ("q", "d2", 2), ("q", "d3", 1)],
        "q string, d string, rel int",
    )
    perfect = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "q string, d string, rank int",
    )
    r = ndcg_at_k(perfect, rels, "q", "d", "rank", "rel", k=10).first()
    assert r["ndcg"] == 1.0 and r["ideal_n"] == 3

    inverted = spark.createDataFrame(
        [("q", "d3", 1), ("q", "d2", 2), ("q", "d1", 3)],
        "q string, d string, rank int",
    )
    r2 = ndcg_at_k(inverted, rels, "q", "d", "rank", "rel", k=10).first()
    # hand value: dcg = 1/1 + 3/log2(3) + 7/2; idcg = 7 + 3/log2(3) + 1/2
    dcg = 1.0 + 3.0 / math.log2(3.0) + 3.5
    idcg = 7.0 + 3.0 / math.log2(3.0) + 0.5
    assert r2["ndcg"] == pytest.approx(dcg / idcg, abs=1e-9)
    assert 0 < r2["ndcg"] < 1

    # no relevant docs -> NULL ndcg, not a crash or a fabricated 0/0
    rel0 = spark.createDataFrame([("q", "dx", 0)], "q string, d string, rel int")
    r3 = ndcg_at_k(perfect, rel0, "q", "d", "rank", "rel", k=10).first()
    assert r3["ndcg"] is None and r3["ideal_n"] == 0


# ------------------------------------------------ X106 curriculum
def test_curriculum_equal_token_phases_quality_ordered(spark):
    from alphavantage_etl_spark.operators.sampling import curriculum_phases

    # 8 docs, 100 tokens each, quality 0.8 down to 0.1
    rows = [(0.8 - 0.1 * i, 100) for i in range(8)]
    df = spark.createDataFrame(rows, "q double, sz long")
    out = {r["phase"]: r for r in curriculum_phases(df, "q", "sz", 4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    for p in range(4):
        assert out[p]["tokens"] == 200 and out[p]["n_docs"] == 2
    # highest quality in phase 0
    assert out[0]["min_q"] == pytest.approx(0.7)
    assert out[3]["max_q"] == pytest.approx(0.2)

    # one quality cell never splits across phases
    same = spark.createDataFrame([(0.5, 100)] * 8, "q double, sz long")
    got = curriculum_phases(same, "q", "sz", 4).collect()
    assert len(got) == 1 and got[0]["phase"] == 0

    with pytest.raises(ValueError):
        curriculum_phases(df, "q", "sz", 0)


# ------------------------------------------------ X107 shard balance
def test_shard_balance_uniform_and_skewed(spark):
    from alphavantage_etl_spark.plans.quality import shard_balance

    # perfectly balanced by construction: one row per shard via n_shards=1
    df = spark.createDataFrame(
        [(i, 100) for i in range(64)], "id long, sz long"
    )
    r = shard_balance(df, "id", "sz", n_shards=1).first()
    assert r["cv"] == 0.0 and r["max_over_mean"] == 1.0 and r["chi2"] == 0.0
    assert r["total_tokens"] == 6400

    # hash-sharded: cv finite, chi2 >= 0, totals preserved
    r32 = shard_balance(df, "id", "sz", n_shards=32).first()
    assert r32["total_tokens"] == 6400 and r32["n_rows"] == 64
    assert r32["chi2"] >= 0.0 and r32["cv"] >= 0.0

    # one giant doc: max_over_mean blows up
    skew = spark.createDataFrame(
        [(i, 100 if i else 100_000) for i in range(64)], "id long, sz long"
    )
    rs = shard_balance(skew, "id", "sz", n_shards=32).first()
    assert rs["max_over_mean"] > 5.0


def test_cusum_excludes_null_ts(spark):
    """A NULL ts must be excluded before the daily rollup (ADVICE r7):
    a NULL-date row would sort FIRST under Spark's cumulative windows
    but LAST under the DuckDB oracle's, corrupting every prefix sum in
    the group. Pin the skipgram_sequences NULL-ts convention: output
    with a NULL-ts row == output without it."""
    from datetime import date, timedelta

    from alphavantage_etl_spark.operators.anomaly import cusum_chart

    rows = [
        ("g", date(2020, 1, 1) + timedelta(days=i), 100.0 + (i % 3))
        for i in range(12)
    ]
    clean = spark.createDataFrame(rows, "g string, ts date, v double")
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("g", None, 500.0)], "g string, ts date, v double"
        )
    )
    want = sorted(map(tuple, cusum_chart(clean, "ts", "v", "g").collect()))
    got = sorted(map(tuple, cusum_chart(dirty, "ts", "v", "g").collect()))
    assert got == want and len(got) == 12
