"""Hand-value unit tests for the late-r8 operator families
(X114-X117: Cohen's kappa, BH FDR control, rank-biased overlap, Gini
decision stump)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401


# ------------------------------------------------ X114 Cohen's kappa
def test_cohen_kappa_hand_value(spark):
    """6 pairs, 4 agreements, marginals 3/2/1 both sides ->
    kappa = (6*4 - 14) / (36 - 14) = 10/22."""
    from alphavantage_etl_spark.operators.evaluation import cohen_kappa

    df = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 1), (0, 1), (1, 0), (2, 2)],
        "a int, b int",
    )
    r = cohen_kappa(df, "a", "b").first()
    assert (r["n"], r["agree"]) == (6, 4)
    assert r["po"] == 4.0 / 6.0
    assert r["pe"] == 14.0 / 6.0 / 6.0
    assert r["kappa"] == pytest.approx(10.0 / 22.0, abs=1e-15)


def test_cohen_kappa_edges(spark):
    """Perfect agreement -> 1; one shared label -> pe = 1 -> NULL;
    NULL raters excluded; disjoint label sets -> pe sum empty -> po
    == kappa_numerator/denominator consistent."""
    from alphavantage_etl_spark.operators.evaluation import cohen_kappa

    perfect = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (None, 1)], "a int, b int"
    )
    r = cohen_kappa(perfect, "a", "b").first()
    assert r["n"] == 3 and r["kappa"] == 1.0

    degenerate = spark.createDataFrame([(1, 1), (1, 1)], "a int, b int")
    r = cohen_kappa(degenerate, "a", "b").first()
    assert r["pe"] == 1.0 and r["kappa"] is None

    # raters never share a label value: pe = 0, kappa = po
    disjoint = spark.createDataFrame([(0, 1), (0, 1)], "a int, b int")
    r = cohen_kappa(disjoint, "a", "b").first()
    assert r["pe"] == 0.0 and r["kappa"] == r["po"] == 0.0


# ------------------------------------------------ X115 BH step-up FDR
def test_bh_reject_step_up(spark):
    """The step-up property: p = [.06, .09], m = 2, q = .1 — rank 1
    FAILS its own threshold (.06 > .05) but rank 2 passes (.09 <=
    .1), so BOTH are rejected (BH rejects everything at or below the
    LARGEST passing rank, not a prefix of individually-passing
    ranks)."""
    from alphavantage_etl_spark.operators.experiment import bh_reject

    df = spark.createDataFrame(
        [("a", 0.06), ("b", 0.09)], "k string, p double"
    )
    got = {
        r["k"]: r for r in bh_reject(df, "k", "p", q=0.1).collect()
    }
    assert got["a"]["rejected"] == 1 and got["b"]["rejected"] == 1
    assert got["a"]["rank"] == 1 and got["b"]["rank"] == 2
    assert got["a"]["m"] == 2


def test_bh_reject_hand_case(spark):
    """p = [.01, .02, .2, .9], q = .1, m = 4: thresholds .025/.05/
    .075/.1 -> i* = 2, exactly the two smallest rejected; ties on p
    break by key so ranks are deterministic."""
    from alphavantage_etl_spark.operators.experiment import bh_reject

    df = spark.createDataFrame(
        [("d", 0.9), ("c", 0.2), ("b", 0.02), ("a", 0.01)],
        "k string, p double",
    )
    got = {r["k"]: r for r in bh_reject(df, "k", "p").collect()}
    assert [got[k]["rejected"] for k in "abcd"] == [1, 1, 0, 0]
    # nothing passes -> zero rejections
    none = spark.createDataFrame(
        [("a", 0.5), ("b", 0.8)], "k string, p double"
    )
    assert all(
        r["rejected"] == 0 for r in bh_reject(none, "k", "p").collect()
    )


def test_two_prop_scan_hand_value(spark):
    """Two keys, 10 rows each, 5 vs 1 positives: chi2 for either key
    (one-vs-rest of the other) = 20*(5*9-5*1)^2/(10*10*6*14)."""
    from alphavantage_etl_spark.operators.experiment import two_prop_scan

    rows = [("k1", 1)] * 5 + [("k1", 0)] * 5 + [("k2", 1)] + [
        ("k2", 0)
    ] * 9
    df = spark.createDataFrame(rows, "k string, f int")
    got = {r["k"]: r for r in two_prop_scan(df, "k", "f").collect()}
    expect = 20.0 * 40.0 * 40.0 / 10.0 / 10.0 / 6.0 / 14.0
    assert got["k1"]["stat"] == pytest.approx(expect, rel=1e-12)
    assert got["k1"]["stat"] == got["k2"]["stat"]  # 2x2 symmetry
    assert got["k1"]["p_proxy"] == 1.0 / (1.0 + got["k1"]["stat"])
    # degenerate margin (all flags equal) -> stat pinned to 0
    flat = spark.createDataFrame(
        [("a", 0), ("b", 0)], "k string, f int"
    )
    assert all(
        r["stat"] == 0.0 for r in two_prop_scan(flat, "k", "f").collect()
    )


# ------------------------------------------------ X116 rank-biased overlap
def test_rbo_hand_value(spark):
    """A = [1,2,3], B with items 1,2 swapped, p=.9, d=3:
    X = [0, 2, 3] -> rbo = .1*(0 + .9*1 + .81*1) = .171."""
    from alphavantage_etl_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3)], "id long, rank long"
    )
    r = rank_biased_overlap(a, b, "id", "rank", p=0.9, depth=3).first()
    assert r["depth"] == 3 and r["n_common"] == 3
    assert r["agreement_at_depth"] == 1.0
    assert r["rbo"] == pytest.approx(0.171, abs=1e-9)


def test_rbo_identical_and_disjoint(spark):
    """Identical prefixes -> rbo = 1 - p^d (geometric sum); disjoint
    id spaces -> 0 everywhere."""
    from alphavantage_etl_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "id long, rank long"
    )
    r = rank_biased_overlap(a, a, "id", "rank", p=0.9, depth=10).first()
    assert r["rbo"] == pytest.approx(1.0 - 0.9**10, abs=1e-9)
    b = spark.createDataFrame(
        [(i + 100, i) for i in range(1, 11)], "id long, rank long"
    )
    r = rank_biased_overlap(a, b, "id", "rank", p=0.9, depth=10).first()
    assert r["rbo"] == 0.0 and r["n_common"] == 0
    with pytest.raises(ValueError):
        rank_biased_overlap(a, a, "id", "rank", p=1.5)
    with pytest.raises(ValueError):
        rank_biased_overlap(a, a, "id", "rank", depth=0)


# ------------------------------------------------ X117 Gini stump
def test_gini_stump_perfect_split(spark):
    """v=1 all positive, v=2 all negative -> cut at 1, split gini 0,
    parent 0.5, gain 0.5."""
    from alphavantage_etl_spark.operators.classify import gini_stump

    rows = [(1, 1)] * 4 + [(2, 0)] * 4
    df = spark.createDataFrame(rows, "v int, y int")
    r = gini_stump(df, "y", "v").first()
    assert (r["n"], r["n_pos"], r["best_threshold"]) == (8, 4, 1)
    assert r["gini_parent"] == 0.5
    assert r["gini_split"] == 0.0 and r["gain"] == 0.5


def test_gini_stump_hand_value_and_edges(spark):
    """Three values with a soft separation: the argmin lands at the
    hand-computed threshold; single-valued feature -> no candidate
    cut -> empty; grid over max_grid raises in-plan."""
    from alphavantage_etl_spark.operators.classify import gini_stump

    # v=1: 3 pos / 1 neg; v=2: 1/1; v=3: 0/4
    rows = (
        [(1, 1)] * 3 + [(1, 0)] + [(2, 1), (2, 0)] + [(3, 0)] * 4
    )
    df = spark.createDataFrame(rows, "v int, y int")
    r = gini_stump(df, "y", "v").first()
    # cut t=2: L=(4 pos, 2 neg) gini 4/9; R=(0,4) gini 0 ->
    # split = .6*(4/9) = 4/15 ; cut t=1: L=(3,1) gini 3/8, R=(1,5)
    # gini 5/18 -> split = .4*3/8 + .6*5/18 = .15+.1666 = .3166
    assert r["best_threshold"] == 2
    assert r["gini_split"] == pytest.approx(4.0 / 15.0, rel=1e-12)
    # parent: 4/10 positive -> 1 - (.16 + .36) = .48
    assert r["gini_parent"] == pytest.approx(0.48, rel=1e-12)
    assert r["gain"] == pytest.approx(0.48 - 4.0 / 15.0, rel=1e-12)

    single = spark.createDataFrame([(5, 1), (5, 0)], "v int, y int")
    assert gini_stump(single, "y", "v").count() == 0

    wide = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "v int, y int"
    )
    with pytest.raises(Exception, match="max_grid"):
        gini_stump(wide, "y", "v", max_grid=5).collect()


# ------------------------------------------------ X118 permutation test
def test_perm_test_planted_effect(spark):
    """Flag separates values 0 vs 100 exactly: the observed diff is
    far outside the hash-permutation null, so p is small; the add-one
    identity p = (1 + n_ge)/(P + 1) holds exactly (deterministic
    content-addressed permutations -> stable across runs/engines)."""
    from alphavantage_etl_spark.operators.experiment import perm_test_means

    rows = [(i, 1, 100.0) for i in range(30)] + [
        (i + 100, 0, 0.0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, f int, v double")
    r = perm_test_means(df, "id", "f", "v", n_perms=19).first()
    assert (r["n"], r["n1"], r["n0"]) == (60, 30, 30)
    assert r["obs_diff"] == 100.0
    assert r["p_value"] == (1.0 + r["n_ge"]) / 20.0
    assert r["p_value"] <= 0.2  # planted effect: at most light tail mass

    # no effect: both groups identical constants -> every pseudo-perm
    # diff is 0 = |obs| -> n_ge = n_perms -> p = 1
    flat = spark.createDataFrame(
        [(i, i % 2, 5.0) for i in range(40)], "id long, f int, v double"
    )
    r = perm_test_means(flat, "id", "f", "v", n_perms=9).first()
    assert r["obs_diff"] == 0.0 and r["p_value"] == 1.0

    # single-sided label -> no observed diff -> NULL p
    one = spark.createDataFrame(
        [(i, 1, 5.0) for i in range(5)], "id long, f int, v double"
    )
    r = perm_test_means(one, "id", "f", "v", n_perms=5).first()
    assert r["obs_diff"] is None and r["p_value"] is None

    with pytest.raises(ValueError):
        perm_test_means(df, "id", "f", "v", n_perms=0)
