"""Hand-value unit tests for the r6 operator families (X79-X100)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ X79 Mann-Whitney U
def test_mwu_hand_value_no_ties(spark):
    from alphavantage_etl_spark.functions.distribution import mann_whitney_u

    # a = {1,2,3}, b = {4,5}: all b above all a -> U_a = 0
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    b = spark.createDataFrame([(4.0,), (5.0,)], "v double")
    r = mann_whitney_u(a, b, "v").first()
    assert r["n_a"] == 3 and r["n_b"] == 2
    assert r["u_stat"] == 0.0  # no (a, b) pair has a > b
    # symmetric: swapping sides gives U = n_a*n_b
    r2 = mann_whitney_u(b, a, "v").first()
    assert r2["u_stat"] == 6.0
    # z magnitudes equal, signs opposite
    assert r["z"] == pytest.approx(-r2["z"])


def test_mwu_ties_midrank_and_identical(spark):
    from alphavantage_etl_spark.functions.distribution import mann_whitney_u

    # identical samples: U = n*n/2, z undefined direction -> 0/sqrt -> 0
    a = spark.createDataFrame([(1.0,), (2.0,), (2.0,)], "v double")
    r = mann_whitney_u(a, a, "v").first()
    assert r["u_stat"] == pytest.approx(4.5)  # n1*n2/2
    assert r["z"] == 0.0
    # scipy-checked hand case with a tie across sides:
    # a={1,2}, b={2,3}: ranks 1, 2.5, 2.5, 4 -> R_a=3.5, U=2*2+3-3.5=3.5...
    a2 = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b2 = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    u = mann_whitney_u(a2, b2, "v").first()["u_stat"]
    # U1 = R_a - n1(n1+1)/2 = 3.5 - 3 = 0.5 (scipy-checked)
    assert u == pytest.approx(0.5)


def test_mwu_grid_bound_raises_and_empty_side(spark):
    from alphavantage_etl_spark.functions.distribution import mann_whitney_u

    a = spark.range(500).selectExpr("cast(id as double) as v")
    # the r8 lazy in-plan guard raises at ACTION time as a Spark
    # runtime error (assert_true), no longer a driver-side ValueError
    with pytest.raises(Exception, match="max_grid"):
        mann_whitney_u(a, a, "v", max_grid=10).first()
    empty = spark.createDataFrame([], "v double")
    r = mann_whitney_u(a.limit(3), empty, "v").first()
    assert r["u_stat"] is None and r["z"] is None and r["n_b"] == 0


# ------------------------------------------------ X80 chi-squared
def test_chi2_perfect_association_and_independence(spark):
    from alphavantage_etl_spark.functions.distribution import (
        chi2_independence,
    )

    # perfect association: x determines y -> V = 1
    rows = [("a", "p")] * 10 + [("b", "q")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y").first()
    assert r["cramers_v"] == pytest.approx(1.0)
    assert r["chi2"] == pytest.approx(20.0)
    assert r["dof"] == 1
    # independence: uniform product -> chi2 = 0
    rows2 = [(x, y) for x in "ab" for y in "pq" for _ in range(5)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = chi2_independence(df2, "x", "y").first()
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0


def test_chi2_null_level_counts(spark):
    from alphavantage_etl_spark.functions.distribution import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [("a", "p"), (None, "q"), (None, "q"), ("a", "p")],
        "x string, y string",
    )
    r = chi2_independence(df, "x", "y").first()
    assert r["n_rows"] == 4 and r["n_x"] == 2  # NULL is a level
    assert r["cramers_v"] == pytest.approx(1.0)


# ------------------------------------------------ X84 Benford
def test_benford_all_digits_emitted_and_probs(spark):
    from alphavantage_etl_spark.functions.distribution import (
        benford_deviation,
    )

    # values 1.00..9.00 once each -> first digits 1..9 observed once;
    # 0 and negatives excluded
    vals = [(float(d),) for d in range(1, 10)] + [(0.0,), (-5.0,), (None,)]
    df = spark.createDataFrame(vals, "v double")
    rows = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert set(rows) == {str(d) for d in range(1, 10)}
    assert all(r["n"] == 1 for r in rows.values())
    assert rows["1"]["observed_p"] == pytest.approx(1 / 9)
    assert rows["1"]["expected_p"] == pytest.approx(math.log10(2), abs=1e-9)
    # zero-count digit still emitted
    df2 = spark.createDataFrame([(1.23,), (19.0,)], "v double")
    rows2 = {r["digit"]: r for r in benford_deviation(df2, "v").collect()}
    assert rows2["9"]["n"] == 0 and len(rows2) == 9


# ------------------------------------------------ X83 Gini
def test_gini_even_and_concentrated(spark):
    from alphavantage_etl_spark.functions.distribution import (
        gini_concentration,
    )

    # perfectly even: 4 entities x 25 -> G = 0
    even = [("g1", i, 25.0) for i in range(4)]
    # fully concentrated: one entity holds everything -> G = (n-1)/n
    conc = [("g2", 0, 100.0)] + [("g2", i, 0.0) for i in range(1, 4)]
    df = spark.createDataFrame(even + conc, "g string, e long, v double")
    out = {r["g"]: r for r in gini_concentration(df, "g", "e", "v").collect()}
    assert out["g1"]["gini"] == pytest.approx(0.0)
    assert out["g2"]["gini"] == pytest.approx(3 / 4)
    assert out["g1"]["total"] == pytest.approx(100.0)


# ------------------------------------------------ X82/X91 robust trend
def test_theil_sen_resists_outlier(spark):
    from alphavantage_etl_spark.operators.trend import group_trend, theil_sen

    # y = 2x with one wild spike at x=5
    rows = [("s", x, 2.0 * x) for x in range(10) if x != 5] + [("s", 5, 500.0)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    sen = theil_sen(df, "g", "x", "y").first()
    assert sen["sen_slope"] == pytest.approx(2.0)
    assert sen["n_points"] == 10 and sen["n_pairs"] == 45
    ols = group_trend(df, "g", "x", "y").first()
    assert abs(ols["slope"] - 2.0) > 1  # OLS dragged well off by the spike


def test_mann_kendall_monotone_and_flat(spark):
    from alphavantage_etl_spark.operators.trend import mann_kendall

    up = [("u", x, float(x)) for x in range(8)]
    flat = [("f", x, 7.0) for x in range(8)]
    df = spark.createDataFrame(up + flat, "g string, x long, y double")
    out = {r["g"]: r for r in mann_kendall(df, "g", "x", "y").collect()}
    assert out["u"]["s_stat"] == 28  # C(8,2), all increasing
    assert out["u"]["z"] > 3
    assert out["f"]["s_stat"] == 0
    # all-tied group: variance fully tie-corrected to 0 -> NULL z
    assert out["f"]["z"] is None


# ------------------------------------------------ X89 skew diagnostics
def test_key_skew_stats_hand_values(spark):
    from alphavantage_etl_spark.operators.skew import hot_keys, key_skew_stats

    # key 1 x6, keys 2..5 x1 -> n=10, keys=5, max=6, avg=2
    rows = [(1,)] * 6 + [(2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_stats(df, "k").first()
    assert r["n_rows"] == 10 and r["n_keys"] == 5
    assert r["max_freq"] == 6 and r["avg_freq"] == 2.0
    assert r["skew_ratio"] == 3.0
    assert r["p50_freq"] == 1  # 4 of 5 keys have freq 1
    assert r["p99_freq"] == 6
    hk = hot_keys(df, "k", top_k=2).collect()
    assert [(h["key"], h["freq"]) for h in hk] == [(1, 6), (2, 1)]
    assert hk[0]["share"] == pytest.approx(0.6)


# ------------------------------------------------ X85 templates
def test_mine_templates_masks_and_ranks(spark):
    from alphavantage_etl_spark.operators.templates import mine_templates

    rows = [
        (1, "error 404 at node 7"),
        (2, "Error 500 at   node 12"),
        (3, "ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = mine_templates(df, "text", "doc_id", top_k=5).collect()
    assert out[0]["template"] == "error # at node #"
    assert out[0]["n_docs"] == 2 and out[0]["example_id"] == 1
    assert out[1]["template"] == "ok"


# ------------------------------------------------ X95 bigram LM
def test_bigram_next_tokens_probs(spark):
    from alphavantage_etl_spark.operators.lm import bigram_next_tokens

    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("the dog sat",)],
        "text string",
    )
    out = bigram_next_tokens(df, "text", top_contexts=2, top_next=2).collect()
    by_ctx = {}
    for r in out:
        by_ctx.setdefault(r["context"], []).append(r)
    # 'the' appears 3x as context: cat (2), dog (1)
    the = sorted(by_ctx["the"], key=lambda r: r["rank"])
    assert the[0]["next_token"] == "cat"
    assert the[0]["prob"] == pytest.approx(2 / 3)
    assert the[1]["next_token"] == "dog"
    # 'cat' -> ran/sat tie broken lexicographically
    cat = sorted(by_ctx["cat"], key=lambda r: r["rank"])
    assert [c["next_token"] for c in cat] == ["ran", "sat"]


# ------------------------------------------------ X96 novelty
def test_doc_novelty_rare_terms_rank_first(spark):
    from alphavantage_etl_spark.operators.tfidf import doc_novelty

    rows = [
        (1, "common common words"),
        (2, "common words"),
        (3, "xylophone quartz zephyr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = doc_novelty(df, "text", "doc_id", top_k=3).collect()
    assert out[0]["doc_id"] == 3 and out[0]["rank"] == 1
    assert out[0]["n_terms"] == 3
    assert out[0]["novelty"] > out[-1]["novelty"]


# ------------------------------------------------ X92 fertility
def test_token_fertility_ratios(spark):
    from alphavantage_etl_spark.functions.text import token_fertility

    df = spark.createDataFrame(
        [("en", "hello world"), ("en", "a b"), ("xx", "")],
        "lang string, text string",
    )
    out = {r["lang"]: r for r in token_fertility(df, "text", "lang").collect()}
    en = out["en"]
    assert en["n_docs"] == 2 and en["ws_tokens"] == 4
    assert en["fertility"] == en["bpe_tokens"] / 4
    assert out["xx"]["fertility"] is None  # zero ws tokens


# ------------------------------------------------ X93 percentile bands
def test_percentile_bands_week_grid(spark):
    from datetime import datetime

    from alphavantage_etl_spark.operators.resample import percentile_bands

    # 1970-01-05 was a Monday
    rows = [
        (datetime(1970, 1, 5 + d, 12), float(v), "t")
        for d, v in [(0, 1), (1, 2), (2, 3), (7, 10), (8, 20)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double, g string")
    out = {
        str(r["week_start"]): r
        for r in percentile_bands(df, "ts", "value", "g").collect()
    }
    assert set(out) == {"1970-01-05", "1970-01-12"}
    w1 = out["1970-01-05"]
    assert w1["n"] == 3 and w1["p50"] == 2.0
    assert out["1970-01-12"]["p50"] == 15.0  # interpolated


# ------------------------------------------------ X81 MAD outliers
def test_mad_outliers_flags_spike_zscore_misses(spark):
    from alphavantage_etl_spark.operators.anomaly import mad_outliers

    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 10.2, 11.8, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = mad_outliers(df, "g", "v").first()
    assert r["n"] == 8 and r["n_outliers"] == 1
    assert 10 <= r["med"] <= 12
    # constant group: MAD 0, nothing beyond the 0 fence but the spike
    df2 = spark.createDataFrame(
        [("c", 5.0)] * 5 + [("c", 6.0)], "g string, v double"
    )
    r2 = mad_outliers(df2, "g", "v").first()
    assert r2["mad"] == 0.0 and r2["n_outliers"] == 1


# ------------------------------------------------ X88 profile diff
def test_profile_diff_flags_null_and_range_shift(spark):
    from alphavantage_etl_spark.plans.quality import profile_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (9, None)], "k long, s string"
    )
    out = {r["column"]: r for r in profile_diff(old, new).collect()}
    k = out["k"]
    assert k["range_changed"] and k["drift_flag"]  # max 3 -> 9
    s = out["s"]
    assert s["null_rate_shift"] == pytest.approx(2 / 3)
    assert s["drift_flag"]
    # identical snapshots: no flags
    same = {
        r["column"]: r for r in profile_diff(old, old).collect()
    }
    assert not same["k"]["drift_flag"] and not same["s"]["drift_flag"]


# ------------------------------------------------ X90 IPW
def test_ipw_recovers_effect_under_confounding(spark):
    from alphavantage_etl_spark.operators.experiment import ipw_effect

    # stratum A (p=0.8 treated), stratum B (p=0.2): outcome = 1.0 + 0.5*T
    # + stratum effect (A: +1). Naive diff is confounded; IPW with the
    # true propensity recovers ~0.5.
    rows = []
    for strat, p, base, n in [("A", 0.8, 2.0, 100), ("B", 0.2, 1.0, 100)]:
        n_t = int(n * p)
        for i in range(n):
            t = 1 if i < n_t else 0
            rows.append((t, base + 0.5 * t, p))
    df = spark.createDataFrame(rows, "t int, y double, p double")
    r = ipw_effect(df, "t", "y", "p").first()
    assert r["n"] == 200 and r["n_treat"] == 100
    assert r["ate"] == pytest.approx(0.5, abs=1e-6)
    # naive diff-of-means: treated pool is 80% stratum A (base 2.0),
    # control pool only 20% -> E[y|T=1]=2.3, E[y|T=0]=1.2, naive=1.1:
    # confounded by 0.6 where IPW recovered the true 0.5
    naive = (80 * 2.5 + 20 * 1.5) / 100 - (20 * 2.0 + 80 * 1.0) / 100
    assert abs(naive - 1.1) < 1e-9

    with pytest.raises(ValueError, match="clip"):
        ipw_effect(df, "t", "y", "p", clip=(0.5, 0.4))


# ------------------------------------------------ X97 RFM
def test_rfm_scores_inversion_and_segments(spark):
    from datetime import datetime

    from alphavantage_etl_spark.operators.cohorts import rfm_scores

    # 5 customers with strictly increasing recency/frequency/monetary
    rows = []
    for c in range(5):
        for k in range(c + 1):  # frequency 1..5
            rows.append((c, datetime(2020, 1 + c, 1), 100.0 * (c + 1)))
    df = spark.createDataFrame(rows, "cust long, ts timestamp, v double")
    out = {r["customer"]: r for r in rfm_scores(df, "cust", "ts", "v").collect()}
    # customer 4 ordered most recently, most often, most value
    assert out[4]["r_score"] == 5 and out[4]["f_score"] == 5
    assert out[4]["m_score"] == 5 and out[4]["segment"] == "555"
    # customer 0 is the stalest/least: all 1s
    assert out[0]["segment"] == "111"
    assert out[4]["recency_days"] == 0
    assert out[0]["frequency"] == 1 and out[0]["monetary"] == 100.0


# ------------------------------------------------ X98 label noise
def test_label_noise_audit_flags_minority(spark):
    from alphavantage_etl_spark.operators.similarity import label_noise_audit

    # node 1 labeled 'b' inside an 'a' neighborhood -> 100% disagree
    graph = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2)],
        "vec_id long, neighbor_id long",
    )
    labels = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "a")], "vec_id long, label string"
    )
    out = {r["vec_id"]: r for r in label_noise_audit(graph, labels).collect()}
    assert out[1]["disagree_frac"] == 1.0 and out[1]["n_neighbors"] == 2
    # nodes 2/3 disagree only with node 1 (1 of 2 = 0.5 >= bar)
    assert out[2]["disagree_frac"] == 0.5
    # a tighter bar drops them
    strict = label_noise_audit(graph, labels, min_disagree=0.9).collect()
    assert [r["vec_id"] for r in strict] == [1]


# ------------------------------------------------ X87 skip-grams
def test_skipgram_gap_window_and_support(spark):
    from datetime import datetime

    from alphavantage_etl_spark.operators.sessionize import (
        skipgram_sequences,
    )

    def ev(u, i, t):
        return (u, datetime(2020, 1, 1, 0, i), t)

    rows = [
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "buy"),
        ev(2, 0, "view"), ev(2, 1, "x"), ev(2, 2, "y"), ev(2, 3, "buy"),
        ev(3, 0, "view"), ev(3, 1, "x"), ev(3, 2, "y"), ev(3, 3, "z"),
        ev(3, 4, "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in skipgram_sequences(
            df, "u", "ts", "t", max_gap=3, min_support=2
        ).collect()
    }
    # view->buy within 3 steps for users 1 and 2; user 3's buy is 4 away
    vb = out[("view", "buy")]
    assert vb["support"] == 2 and vb["n_antecedent"] == 3
    assert vb["confidence"] == pytest.approx(2 / 3)


# ------------------------------------------------ X100 weighted median
def test_weighted_median_vs_unweighted(spark):
    from alphavantage_etl_spark.functions.distribution import weighted_median

    # values 1..4; weight on 4 dominates -> weighted median 4
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 10.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    r = weighted_median(df, "g", "v", "w").first()
    assert r["wmedian"] == 4.0 and r["total_weight"] == 13.0 and r["n"] == 4
    # equal weights: smallest v with 2*cum >= total -> 2.0
    df2 = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (1, 2, 3, 4)], "g string, v double, w double"
    )
    assert weighted_median(df2, "g", "v", "w").first()["wmedian"] == 2.0
    # zero/negative weights excluded
    df3 = spark.createDataFrame(
        [("g", 1.0, 0.0), ("g", 9.0, 1.0)], "g string, v double, w double"
    )
    assert weighted_median(df3, "g", "v", "w").first()["wmedian"] == 9.0


# ------------------------------------------------ X99 seasonal anomaly
def test_seasonal_anomaly_ignores_weekly_rhythm(spark):
    from datetime import datetime, timedelta

    from alphavantage_etl_spark.operators.anomaly import (
        seasonal_adjusted_anomalies,
    )

    # 8 weeks: Sundays always 10, other days always 100 — a pure weekly
    # rhythm; plus ONE genuinely anomalous Sunday at 100 (10x its dow
    # norm but equal to the weekday level a raw z-score would accept).
    rows = []
    d0 = datetime(2020, 1, 6)  # a Monday
    for day in range(56):
        d = d0 + timedelta(days=day)
        v = 10.0 if d.weekday() == 6 else 100.0
        if day == 48:  # a Sunday
            assert d.weekday() == 6
            v = 100.0
        rows.append((d, v, "t"))
    df = spark.createDataFrame(rows, "ts timestamp, value double, g string")
    out = seasonal_adjusted_anomalies(df, "ts", "value", "g", z_threshold=2.0)
    flagged = [r for r in out.collect() if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["date"].isoformat() == (d0 + timedelta(days=48)).date().isoformat()


# ------------------------------------------------ X94 EWMA chart
@pytest.mark.slow
def test_ewma_chart_catches_drift_spike_detectors_miss(spark):
    from datetime import datetime, timedelta

    from alphavantage_etl_spark.operators.anomaly import ewma_control_chart

    # 60 days around 100 with small noise, then 30 days at a persistent
    # +0.6-sigma-ish shift: no single day is a spike, but the EWMA line
    # walks out of the control band.
    rows = []
    d0 = datetime(2020, 1, 1)
    for day in range(90):
        base = 100.0 + (1.0 if day % 2 else -1.0)  # sigma ~ 1
        if day >= 60:
            base += 2.5
        rows.append((d0 + timedelta(days=day), base, "t"))
    df = spark.createDataFrame(rows, "ts timestamp, value double, g string")
    out = ewma_control_chart(df, "ts", "value", "g", span=10).collect()
    by_day = sorted(out, key=lambda r: r["date"])
    assert not any(r["is_breach"] for r in by_day[:55])
    assert any(r["is_breach"] for r in by_day[60:])
    # recursion sanity: first ewma equals the first value
    assert by_day[0]["ewma"] == by_day[0]["day_value"]
    # constant series: zero variance -> no breaches, not NULL noise
    flat = spark.createDataFrame(
        [(d0 + timedelta(days=d), 5.0, "c") for d in range(10)],
        "ts timestamp, value double, g string",
    )
    fr = ewma_control_chart(flat, "ts", "value", "g").collect()
    assert all(r["is_breach"] is False for r in fr)


# --------------------------------------- r7 degenerate-contract pins
def test_chi2_empty_input_matches_sql_aggregate_shape(spark):
    """An EMPTY input must produce the oracle's `FROM s CROSS JOIN tot`
    row — n_x = n_y = 0 and dof = (0-1)*(0-1) = 1 with NULL n_rows /
    chi2 / V — not an all-NULL collapse (r6 advisor finding)."""
    from alphavantage_etl_spark.functions.distribution import (
        chi2_independence,
    )

    empty = spark.createDataFrame([], "a string, b string")
    r = chi2_independence(empty, "a", "b").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_rows"] is None
    assert row["n_x"] == 0 and row["n_y"] == 0
    assert row["dof"] == 1
    assert row["chi2"] is None and row["cramers_v"] is None


def test_benford_emits_spine_with_no_qualifying_values(spark):
    """Ungrouped benford over an input with NO positive values must
    still emit the 9-digit spine (n = 0, NULL ratios) — the SQL
    spine-LEFT-JOIN shape (r6 advisor finding)."""
    from alphavantage_etl_spark.functions.distribution import (
        benford_deviation,
    )

    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (None,)], "v double"
    )
    rows = benford_deviation(df, "v").orderBy("digit").collect()
    assert [r["digit"] for r in rows] == [str(d) for d in range(1, 10)]
    assert all(r["n"] == 0 for r in rows)
    assert all(r["observed_p"] is None for r in rows)
    assert all(r["chi2_term"] is None for r in rows)
    assert rows[0]["expected_p"] == pytest.approx(math.log10(2.0))


def test_theil_sen_n_points_matches_pair_grid(spark):
    """A group with an x whose every y is NULL: that x is not a series
    point, so n_pairs == C(n_points, 2) must hold (r6 advisor finding:
    n_points used to count x-non-null only)."""
    from alphavantage_etl_spark.operators.trend import theil_sen

    rows = [
        ("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, None), ("g", 4, 40.0),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    r = theil_sen(df, "g", "x", "y").first()
    assert r["n_points"] == 3
    assert r["n_pairs"] == 3  # C(3,2), not C(4,2)


def test_skipgram_null_ts_rows_excluded(spark):
    """Rows with NULL ts have no timeline position and engines disagree
    on NULL sort placement — they must be filtered, not sorted-first
    (r6 advisor finding)."""
    from datetime import datetime

    from alphavantage_etl_spark.operators.sessionize import (
        skipgram_sequences,
    )

    rows = [
        (1, None, "zzz"),
        (1, datetime(2020, 1, 1, 0, 0), "view"),
        (1, datetime(2020, 1, 1, 0, 1), "buy"),
        (2, None, "zzz"),
        (2, datetime(2020, 1, 1, 0, 0), "view"),
        (2, datetime(2020, 1, 1, 0, 1), "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in skipgram_sequences(
            df, "u", "ts", "t", max_gap=1, min_support=1
        ).collect()
    }
    # with NULL-ts rows sorted first, (zzz -> view) would be a pair;
    # with them excluded, only (view -> buy) exists
    assert ("zzz", "view") not in out
    assert out[("view", "buy")]["support"] == 2
    assert all(a != "zzz" and c != "zzz" for (a, c) in out)


def test_ewma_calendar_bound_enforced(spark):
    """The EWMA fold is the only per-row Python loop in the repo; its
    calendar-bounded contract is enforced — a group exceeding
    max_group_rows raises instead of silently running a corpus-sized
    loop on an executor (r6 verdict item #5)."""
    from datetime import date, timedelta

    from alphavantage_etl_spark.operators.anomaly import ewma_control_chart

    rows = [
        ("g", date(2020, 1, 1) + timedelta(days=i), 1.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, ts date, v double")
    # under the bound: fine
    assert (
        ewma_control_chart(df, "ts", "v", "g", span=3, max_group_rows=20)
        .count()
        == 20
    )
    # over the bound: loud failure, not a silent loop
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        ewma_control_chart(
            df, "ts", "v", "g", span=3, max_group_rows=10
        ).count()
    assert "calendar-bounded contract" in str(exc.value)

    with pytest.raises(ValueError):
        ewma_control_chart(df, "ts", "v", "g", max_group_rows=0)
