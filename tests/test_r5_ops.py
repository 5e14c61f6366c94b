"""Unit tests for the r5 operator additions (X59-X71): cross-split
leakage, vocabulary coverage, rolling median, quantile normalization,
centroid outliers, corpus divergence, label propagation, BPE merge
learning, CUPED A/B analysis, k-center coreset. (Linear/Markov
attribution and active users live in test_cohorts.py; graph walks in
test_graph.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ cross-split leakage
def test_cross_split_leakage_only_straddling_pairs(spark):
    from alphavantage_etl_spark.operators.contamination import (
        cross_split_leakage,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "train"),
        (2, base + " x", "en", "test"),   # near-dup of 1, straddles
        (3, base + " y", "en", "train"),  # near-dup of 1, same split
        (4, "completely different content with other words", "en", "test"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, split string"
    )
    out = cross_split_leakage(
        df, "text", "doc_id", "split", block_cols=["lang"], threshold=0.5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    # (1,2) straddles; (1,3) and (2,3)... (2,3) straddles too (test/train)
    assert (1, 2) in pairs and (2, 3) in pairs
    assert (1, 3) not in pairs, "same-split pair must be pruned"
    for r in out:
        assert r["split_a"] != r["split_b"]
        assert r["jaccard"] >= 0.5


def test_cross_split_leakage_blocks_limit_pairing(spark):
    from alphavantage_etl_spark.operators.contamination import (
        cross_split_leakage,
    )

    base = "identical text content for both rows here"
    df = spark.createDataFrame(
        [(1, base, "en", "train"), (2, base, "de", "test")],
        "doc_id long, text string, lang string, split string",
    )
    out = cross_split_leakage(
        df, "text", "doc_id", "split", block_cols=["lang"], threshold=0.1
    ).collect()
    assert out == []  # different blocks are never compared


# ------------------------------------------------ vocabulary coverage
def test_vocab_coverage_counts_and_rates(spark):
    from alphavantage_etl_spark.operators.tfidf import vocab_coverage

    rows = [
        (1, "aa aa bb"),       # aa, bb in head vocab
        (2, "aa zz"),          # zz is OOV (1 occurrence)
        (3, "zz qq qq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # corpus counts: aa=3, qq=2, zz=2, bb=1 -> top 2 = aa, qq
    # (ties at count 2: qq < zz lexicographically)
    out = {
        r["doc_id"]: r
        for r in vocab_coverage(df, "text", "doc_id", top_k=2).collect()
    }
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 1  # bb OOV
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1  # zz OOV
    assert out[3]["n_tokens"] == 3 and out[3]["n_oov"] == 1  # zz OOV
    assert out[2]["oov_rate"] == pytest.approx(0.5)


def test_vocab_coverage_explicit_vocab_and_multiplicity(spark):
    from alphavantage_etl_spark.operators.tfidf import vocab_coverage

    df = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
    vocab = spark.createDataFrame([("y",)], "term string")
    r = vocab_coverage(df, "text", "doc_id", vocab=vocab).first()
    assert r["n_tokens"] == 4 and r["n_oov"] == 3  # occurrences, not types
    assert r["oov_rate"] == pytest.approx(0.75)


# ------------------------------------------------ rolling median
def test_rolling_median_exact_and_null_under_k(spark):
    import datetime as dt

    from alphavantage_etl_spark.functions.indicators import rolling_median

    t0 = dt.datetime(2024, 1, 1)
    vals = [1.0, 100.0, 3.0]  # median of the 3 = 3.0 (spike-immune)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp_ntz, i long, v double"
    )
    okey = F.struct(F.col("ts"), F.col("i"))
    out = sorted(
        df.select("i", rolling_median("v", okey, 3, ("k",)).alias("m"))
        .collect(),
        key=lambda r: r["i"],
    )
    assert out[0]["m"] is None and out[1]["m"] is None  # under k
    assert out[2]["m"] == 3.0  # the mean would be 34.67

    # even-count interpolation midpoint is exact (x.5 cents)
    df2 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=i), i, v)
         for i, v in enumerate([1.0, 2.0])],
        "k long, ts timestamp_ntz, i long, v double",
    )
    out2 = df2.select(
        "i", rolling_median("v", F.struct(F.col("ts"), F.col("i")), 2, ("k",))
        .alias("m")
    ).collect()
    assert {r["m"] for r in out2} == {None, 1.5}


# ------------------------------------------------ quantile normalization
def test_quantile_normalize_percent_rank_semantics(spark):
    from alphavantage_etl_spark.functions.distribution import (
        quantile_normalize,
    )

    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 20.0),   # tie shares the rank
        (4, "a", 30.0),
        (5, "b", 999.0),  # singleton group -> 0.0
        (6, "c", None),   # NULL value -> NULL qnorm
        (7, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["id"]: r["qnorm"] for r in quantile_normalize(df, "v", "g").collect()}
    assert out[1] == 0.0
    assert out[2] == out[3] == pytest.approx(1 / 3)
    assert out[4] == 1.0
    assert out[5] == 0.0
    assert out[6] is None
    assert out[7] == 0.0
    # every input row survives (the join is left)
    assert len(out) == 7


# ------------------------------------------------ centroid outliers
def test_centroid_outliers_flags_planted_outlier(spark):
    from alphavantage_etl_spark.operators.similarity import centroid_outliers

    # label 0: ten near-identical vectors + one far outlier
    rows = [(i, [1.0, 0.0], 0) for i in range(10)]
    rows.append((99, [-5.0, 5.0], 0))
    # label 1: uniform cluster, top_frac picks its farthest member
    rows += [(100 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = centroid_outliers(df, top_frac=0.1, id_col="vec_id")
    got = {(r["label"], r["vec_id"]): r for r in out.collect()}
    # ceil(0.1 * 11) = 2 for label 0; ceil(0.1 * 10) = 1 for label 1
    assert sum(1 for (lbl, _) in got if lbl == 0) == 2
    assert sum(1 for (lbl, _) in got if lbl == 1) == 1
    assert (0, 99) in got and got[(0, 99)]["rank"] == 1
    assert got[(0, 99)]["dist2"] > 10

    with pytest.raises(ValueError, match="top_frac"):
        centroid_outliers(df, top_frac=0.0)


# ------------------------------------------------ corpus divergence
def test_corpus_divergence_identical_and_disjoint(spark):
    import math

    from alphavantage_etl_spark.operators.tfidf import corpus_divergence

    rows = [
        (1, "a", "x y z"),
        (2, "b", "x y z"),          # identical distribution to a
        (3, "c", "x q q"),          # overlaps a on x only
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in corpus_divergence(df, "text", "source").collect()
    }
    # identical distributions: JS = 0, vocab jaccard = 1
    assert out[("a", "b")]["js_divergence"] == 0.0
    assert out[("a", "b")]["vocab_jaccard"] == 1.0
    # partial overlap: 0 < JS < ln 2, jaccard = 1/4 (x of {x,y,z,q})
    ac = out[("a", "c")]
    assert 0 < ac["js_divergence"] < math.log(2)
    assert ac["vocab_jaccard"] == 0.25
    # hand value: p=(1/3,1/3,1/3) over (x,y,z); q=(1/3,2/3) over (x,q)
    # JS = 0.5*[px ln(2px/(px+qx))] + 0.5*[qx ln(2qx/(px+qx))]
    #      + 0.5*ln2*((1-1/3)+(1-1/3))  with px=qx=1/3 -> first terms 0
    want = 0.5 * math.log(2) * (2 - 1 / 3 - 1 / 3)
    assert ac["js_divergence"] == pytest.approx(want, abs=1e-9)


def test_corpus_divergence_disjoint_pair_emitted_at_ln2(spark):
    """r5 ADVICE: pairs sharing no vocabulary are the MOST divergent —
    they must surface with jaccard 0 and JS = ln 2, not silently vanish
    into the intersection join."""
    import math

    from alphavantage_etl_spark.operators.tfidf import corpus_divergence

    df = spark.createDataFrame(
        [(1, "a", "x x"), (2, "b", "y y")],
        "doc_id long, source string, text string",
    )
    rows = corpus_divergence(df, "text", "source").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert r["vocab_jaccard"] == 0.0
    assert r["js_divergence"] == pytest.approx(math.log(2), abs=1e-9)


# ------------------------------------------------ label propagation
def test_label_propagation_spreads_and_ties_break_low(spark):
    from alphavantage_etl_spark.operators.graph import label_propagation

    # seeds: 1 -> label 10, 5 -> label 20; chain 1-2-3, 5-4-3:
    # round 1: 2 gets 10, 4 gets 20; round 2: 3 sees {10, 20} -> tie
    # on count 1 each -> smallest label 10
    nodes = spark.createDataFrame(
        [(1, 10), (2, None), (3, None), (4, None), (5, 20), (9, None)],
        "id long, label long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 3), (5, 4)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edges, iters=2).collect()
    }
    assert out[1] == 10 and out[5] == 20          # seeds fixed
    assert out[2] == 10 and out[4] == 20          # round-1 spread
    assert out[3] == 10                            # tie -> smaller label
    assert out[9] is None                          # isolated: unreached
    assert len(out) == 6                           # total assignment

    # synchronous LPA re-votes every round: in round 3 node 4's labeled
    # neighborhood becomes {3: 10, 5: 20}, a tie that breaks to the
    # SMALLER label — non-seed labels may legitimately flip (pinned so
    # a refactor to sticky labels is a visible semantic change)
    out3 = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edges, iters=3).collect()
    }
    assert out3[4] == 10 and out3[3] == 10

    import pytest as _pt

    with _pt.raises(ValueError, match="iters"):
        label_propagation(nodes, edges, iters=0)


def test_label_propagation_majority_beats_minority(spark):
    from alphavantage_etl_spark.operators.graph import label_propagation

    # node 0 has three labeled neighbors: two vote 7, one votes 3
    nodes = spark.createDataFrame(
        [(0, None), (1, 7), (2, 7), (3, 3)], "id long, label long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edges, iters=1).collect()
    }
    assert out[0] == 7


# ------------------------------------------------ BPE merge learning
def test_bpe_learn_known_merges_and_greedy_nonoverlap(spark):
    from alphavantage_etl_spark.operators.bpe import (
        bpe_learn,
        bpe_segment_vocab,
    )

    # 'abab' x3, 'ab' x2: pair counts r1: (a,b)=8, (b,a)=3 -> merge 'ab'
    # r2 state: abab -> [ab, ab], ab -> [ab]; pairs: (ab,ab)=3 -> 'abab'
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string"
    )
    m = [tuple(r) for r in bpe_learn(docs, "text", k=3).collect()]
    assert m[0] == (1, "a", "b", "ab", 8)
    assert m[1] == (2, "ab", "ab", "abab", 3)
    # r3: no pairs left -> learning stops early (2 rows, not 3)
    assert len(m) == 2

    seg = {
        r["word"]: r["segmentation"]
        for r in bpe_segment_vocab(docs, "text", k=3).collect()
    }
    assert seg == {"abab": "abab", "ab": "ab"}


def test_bpe_greedy_left_to_right_on_runs(spark):
    from alphavantage_etl_spark.operators.bpe import bpe_segment_vocab

    # 'aaa': merge (a,a) applies left-to-right without overlap -> [aa, a]
    docs = spark.createDataFrame([(1, "aaa aaa aa")], "doc_id long, text string")
    seg = {
        r["word"]: r["segmentation"]
        for r in bpe_segment_vocab(docs, "text", k=1).collect()
    }
    assert seg["aaa"] == "aa a"
    assert seg["aa"] == "aa"


def test_bpe_rejects_bad_k(spark):
    from alphavantage_etl_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        bpe_learn(docs, "text", k=0)


# ------------------------------------------------ CUPED A/B analysis
def test_ab_cuped_reduces_variance_and_keeps_lift(spark):
    """Synthetic experiment: y = x + effect(B) + small noise. CUPED must
    (a) recover the planted lift, (b) slash the variance (x explains
    most of y), (c) keep lift_cuped ~ lift_raw (unbiasedness)."""
    import random

    from alphavantage_etl_spark.operators.experiment import ab_test_cuped

    rng = random.Random(13)
    rows = []
    for u in range(400):
        v = "A" if u % 2 == 0 else "B"
        x = round(rng.uniform(10, 110), 2)       # pre-period covariate
        eff = 5.0 if v == "B" else 0.0
        y = round(x + eff + rng.uniform(-1, 1), 2)
        rows.append((v, x, y))
    users = spark.createDataFrame(rows, "variant string, pre double, post double")
    r = ab_test_cuped(users, "variant", "pre", "post").first()
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert r["lift_cuped"] == pytest.approx(5.0, abs=0.3)
    assert r["lift_raw"] == pytest.approx(5.0, abs=6.0)  # noisy without CUPED
    assert r["theta"] == pytest.approx(1.0, abs=0.05)
    assert r["var_reduction"] > 0.95
    assert abs(r["z_cuped"]) > 10  # the effect is unmistakable after CUPED


def test_ab_cuped_degenerate_cases(spark):
    from alphavantage_etl_spark.operators.experiment import ab_test_cuped

    # constant covariate: var_x = 0 -> theta 0, CUPED == raw
    users = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 1.0, 4.0), ("B", 1.0, 5.0), ("B", 1.0, 7.0)],
        "variant string, pre double, post double",
    )
    r = ab_test_cuped(users, "variant", "pre", "post").first()
    assert r["theta"] == 0.0
    assert r["lift_cuped"] == r["lift_raw"] == pytest.approx(3.0)

    # empty arm: nothing to compare -> empty result
    solo = spark.createDataFrame(
        [("A", 1.0, 2.0)], "variant string, pre double, post double"
    )
    assert ab_test_cuped(solo, "variant", "pre", "post").collect() == []

    # both arms constant: zero SE -> z NULL
    const = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 1.0, 2.0), ("B", 1.0, 3.0), ("B", 1.0, 3.0)],
        "variant string, pre double, post double",
    )
    rc = ab_test_cuped(const, "variant", "pre", "post").first()
    assert rc["z_cuped"] is None and rc["lift_cuped"] == pytest.approx(1.0)


def test_ab_assign_is_content_addressed(spark):
    from alphavantage_etl_spark.operators.experiment import ab_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "user_id long")
    a1 = {r["user_id"]: r["v"] for r in df.select("user_id", ab_assign(df, "user_id").alias("v")).collect()}
    # stable under re-evaluation and roughly balanced
    a2 = {r["user_id"]: r["v"] for r in df.select("user_id", ab_assign(df, "user_id").alias("v")).collect()}
    assert a1 == a2
    n_a = sum(1 for v in a1.values() if v == "A")
    assert 200 <= n_a <= 300


# ------------------------------------------------ k-center coreset
def test_kcenter_picks_farthest_and_radius_shrinks(spark):
    from alphavantage_etl_spark.operators.similarity import kcenter_coreset

    # three tight clumps far apart + the min-id seed in clump A: the
    # first picks must cover each clump before refining within one
    rows = []
    for i, base in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for j in range(4):
            rows.append((i * 10 + j, [base[0] + 0.01 * j, base[1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(
        map(tuple, kcenter_coreset(df, k=4).collect())
    )
    ranks = {r: (vid, d) for r, vid, d in out}
    assert ranks[1][0] == 0 and ranks[1][1] is None        # min-id seed
    # picks 2 and 3 land in the two OTHER clumps (ids 10-13 and 20-23)
    clumps = {ranks[2][0] // 10, ranks[3][0] // 10}
    assert clumps == {1, 2}
    # covering radius is monotone non-increasing
    assert ranks[2][1] >= ranks[3][1] >= ranks[4][1] >= 0
    # pick 4 refines WITHIN a clump: distance collapses vs pick 3
    assert ranks[4][1] < 1.0 < ranks[3][1]


def test_kcenter_bounds_and_degenerate(spark):
    import pytest as _pt

    from alphavantage_etl_spark.operators.similarity import kcenter_coreset

    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<float>"
    )
    out = kcenter_coreset(df, k=5).collect()  # k > |points|: stops early
    assert [r["center_rank"] for r in sorted(out, key=lambda r: r["center_rank"])] == [1, 2]
    with _pt.raises(ValueError, match="k must"):
        kcenter_coreset(df, k=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_coreset(empty, k=3).collect() == []
