"""X133-X134: pairwise-preference grid, Bradley-Terry MM fit,
intransitivity audit — semantics pinned by example and by a pure-Python
replica of the exact quantized iteration."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.preference import (
    _SCALE,
    _TERM_Q,
    bradley_terry_strengths,
    intransitive_triads,
    pairwise_win_grid,
)


def _comparisons(spark):
    # 3 items with planted strengths: 2 beats 1 and 0 most of the time,
    # 1 beats 0 most of the time; a few upsets
    rows = []
    for n, (a, b, a_wins) in enumerate(
        [(0, 1, False)] * 8 + [(1, 0, False)] * 2   # 1 beats 0, 8-2
        + [(1, 2, False)] * 7 + [(2, 1, False)] * 3  # 2 beats 1, 7-3
        + [(0, 2, False)] * 9 + [(0, 2, True)] * 1   # 2 beats 0, 9-1
    ):
        rows.append((n, a, b, a_wins))
    return spark.createDataFrame(
        rows, "cmp_id long, item_a long, item_b long, a_wins boolean"
    )


def test_win_grid_canonicalizes_and_counts(spark):
    g = {
        (r["item_a"], r["item_b"]): (r["wins_a"], r["wins_b"])
        for r in pairwise_win_grid(
            _comparisons(spark), "item_a", "item_b", "a_wins"
        ).collect()
    }
    assert g == {(0, 1): (2, 8), (1, 2): (3, 7), (0, 2): (1, 9)}


def test_win_grid_drops_self_and_null(spark):
    df = spark.createDataFrame(
        [(1, 1, True), (1, 2, None), (2, 1, False)],
        "item_a long, item_b long, a_wins boolean",
    )
    g = pairwise_win_grid(df, "item_a", "item_b", "a_wins").collect()
    assert len(g) == 1
    r = g[0]
    # (2,1,a_wins=False) canonicalizes to (1,2) with lo (=1) winning
    assert (r["item_a"], r["item_b"], r["wins_a"], r["wins_b"]) == (1, 2, 1, 0)


def _python_bt(grid_rows, iters=10):
    """Pure-Python replica of the exact quantized MM iteration."""

    def away(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    w2, pairs = {}, {}
    for a, b, wa, wb in grid_rows:
        for i, w in ((a, 2 * wa + 1), (b, 2 * wb + 1)):
            w2[i] = w2.get(i, 0) + w
            pairs[i] = pairs.get(i, 0) + 1
    items = sorted(w2)
    p = {i: _SCALE for i in items}
    for _ in range(iters):
        den = {i: 0 for i in items}
        for a, b, wa, wb in grid_rows:
            n2 = float(2 * (wa + wb) + 2)
            t = away(n2 / 2.0 * float(_SCALE) / float(p[a] + p[b]) * _TERM_Q)
            den[a] += t
            den[b] += t
        ratio = {
            i: (w2[i] / 2.0) / (den[i] / float(_TERM_Q)) for i in items
        }
        m = max(ratio.values())
        p = {i: away(ratio[i] / m * _SCALE) for i in items}
    return p


def test_bt_matches_python_replica_and_orders_by_strength(spark):
    grid = pairwise_win_grid(_comparisons(spark), "item_a", "item_b", "a_wins")
    got = {
        r["item"]: (r["strength"], r["n_wins"], r["n_comparisons"])
        for r in bradley_terry_strengths(grid, iters=10).collect()
    }
    want_p = _python_bt([(0, 1, 2, 8), (1, 2, 3, 7), (0, 2, 1, 9)])
    assert {i: s for i, (s, _, _) in got.items()} == want_p
    # planted order: 2 strongest (max-normalized to SCALE), then 1, then 0
    assert got[2][0] == _SCALE
    assert got[2][0] > got[1][0] > got[0][0]
    # exact bookkeeping columns
    assert got[0][1:] == (3, 20)   # item 0: 2+1 wins, 10+10 comparisons
    assert got[1][1:] == (11, 20)
    assert got[2][1:] == (16, 20)


def test_bt_rejects_bad_iters_and_handles_empty(spark):
    grid = pairwise_win_grid(_comparisons(spark), "item_a", "item_b", "a_wins")
    with pytest.raises(ValueError):
        bradley_terry_strengths(grid, iters=0)
    empty = grid.where(F.lit(False))
    assert bradley_terry_strengths(empty).count() == 0


def _grid(spark, rows):
    return spark.createDataFrame(
        rows, "item_a long, item_b long, wins_a long, wins_b long"
    )


def test_intransitive_triads_detects_cycle(spark):
    # rock-paper-scissors: 0>1, 1>2, 2>0
    rps = _grid(spark, [(0, 1, 3, 1), (1, 2, 3, 1), (0, 2, 1, 3)])
    r = intransitive_triads(rps).first()
    assert (r["n_triads"], r["n_cyclic"]) == (1, 1)
    assert r["cyclic_pct"] == 100.0
    # transitive chain: 0>1, 1>2, 0>2
    chain = _grid(spark, [(0, 1, 3, 1), (1, 2, 3, 1), (0, 2, 3, 1)])
    r = intransitive_triads(chain).first()
    assert (r["n_triads"], r["n_cyclic"]) == (1, 0)
    assert r["cyclic_pct"] == 0.0


def test_intransitive_triads_ties_drop_out(spark):
    tied = _grid(spark, [(0, 1, 2, 2), (1, 2, 3, 1), (0, 2, 3, 1)])
    r = intransitive_triads(tied).first()
    assert (r["n_triads"], r["n_cyclic"]) == (0, 0)
    assert r["cyclic_pct"] is None


def test_bt_string_item_ids_and_null_items(spark):
    """Item ids keep their source type — string model names (the usual
    RLHF case) must rank, not silently cast to NULL-long and vanish;
    NULL item ids drop explicitly."""
    rows = (
        [("modelA", "modelB", False)] * 7
        + [("modelA", "modelB", True)] * 3
        + [("modelB", "modelC", False)] * 6
        + [("modelA", "modelC", False)] * 6
        + [(None, "modelC", True)]  # unattributable side: dropped
    )
    df = spark.createDataFrame(
        rows, "item_a string, item_b string, a_wins boolean"
    )
    grid = pairwise_win_grid(df, "item_a", "item_b", "a_wins")
    assert grid.count() == 3  # the NULL-item comparison contributed nothing
    out = {
        r["item"]: r["strength"]
        for r in bradley_terry_strengths(grid, iters=10).collect()
    }
    assert set(out) == {"modelA", "modelB", "modelC"}
    assert out["modelC"] == _SCALE  # wins most
    assert out["modelC"] > out["modelB"] > out["modelA"]


def test_bradley_terry_max_items_ceiling(spark):
    """The inlined strength-map plan bound (r10 verdict): item
    cardinality beyond max_items raises, naming the broadcast-join
    alternative instead of building a megabyte plan."""
    import pytest

    from alphavantage_etl_spark.operators.preference import (
        bradley_terry_strengths,
    )

    grid = spark.createDataFrame(
        [(i, i + 1, 2, 1) for i in range(0, 8, 2)],
        "item_a long, item_b long, wins_a long, wins_b long",
    )
    with pytest.raises(ValueError, match="max_items"):
        bradley_terry_strengths(grid, iters=1, max_items=3)
    # at the bound it still runs
    out = bradley_terry_strengths(grid, iters=1, max_items=8)
    assert out.count() == 8


def test_winrate_wilson_known_values(spark):
    """X143: Wilson bounds pinned against an independent pure-Python
    evaluation of the textbook formula (same association), plus the
    exact-integer count columns."""
    from alphavantage_etl_spark.operators.preference import winrate_wilson

    grid = spark.createDataFrame(
        [(0, 1, 8, 2), (0, 2, 5, 5), (1, 2, 0, 10)],
        "item_a long, item_b long, wins_a long, wins_b long",
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in winrate_wilson(grid).collect()
    }

    def wilson(w, n, z=1.96):
        p = w / n
        zz = z * z
        half = zz / (2.0 * n)
        rad = math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n))
        den = 1.0 + zz / n
        return ((p + half - z * rad) / den, (p + half + z * rad) / den)

    for (a, b), (w, n) in {(0, 1): (8, 10), (0, 2): (5, 10), (1, 2): (0, 10)}.items():
        r = out[(a, b)]
        lb, ub = wilson(w, n)
        assert r["n_games"] == n
        assert r["win_rate_a"] == pytest.approx(w / n, abs=1e-6)
        assert r["wilson_lb_a"] == pytest.approx(lb, abs=1e-6)
        assert r["wilson_ub_a"] == pytest.approx(ub, abs=1e-6)
    # 8-2 at n=10 is NOT decided at 95% (lb ~0.49 < 0.5); 0-10 is
    assert out[(0, 1)]["decided"] is False
    assert out[(0, 2)]["decided"] is False
    assert out[(1, 2)]["decided"] is True


def test_winrate_wilson_bounds_and_extremes(spark):
    """Interval stays inside [0, 1] and brackets the rate even at
    p_hat in {0, 1} (where a normal-approx interval collapses)."""
    from alphavantage_etl_spark.operators.preference import winrate_wilson

    grid = spark.createDataFrame(
        [(0, 1, 3, 0), (0, 2, 0, 1), (1, 2, 1, 0)],
        "item_a long, item_b long, wins_a long, wins_b long",
    )
    for r in winrate_wilson(grid).collect():
        assert 0.0 <= r["wilson_lb_a"] <= r["win_rate_a"] or (
            # quantization can nudge lb a hair past a 0/1 rate's lb
            abs(r["wilson_lb_a"] - r["win_rate_a"]) < 1e-6
        )
        assert 0.0 <= r["wilson_lb_a"] < r["wilson_ub_a"] <= 1.0
        # never a point interval
        assert r["wilson_ub_a"] - r["wilson_lb_a"] > 1e-6


def test_winrate_wilson_rejects_bad_z(spark):
    from alphavantage_etl_spark.operators.preference import winrate_wilson

    grid = spark.createDataFrame(
        [(0, 1, 1, 1)], "item_a long, item_b long, wins_a long, wins_b long"
    )
    with pytest.raises(ValueError, match="z must be"):
        winrate_wilson(grid, z=0.0)


def test_winrate_wilson_drops_zero_game_pairs(spark):
    """A (0, 0) pair carries no evidence: dropped, never an all-NULL
    stats row a downstream `decided` filter would silently swallow."""
    from alphavantage_etl_spark.operators.preference import winrate_wilson

    grid = spark.createDataFrame(
        [(0, 1, 0, 0), (0, 2, 3, 1)],
        "item_a long, item_b long, wins_a long, wins_b long",
    )
    out = winrate_wilson(grid).collect()
    assert [(r["item_a"], r["item_b"]) for r in out] == [(0, 2)]
    assert out[0]["wilson_lb_a"] is not None
