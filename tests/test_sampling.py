"""Sampling / splitting / packing / decontamination operator semantics.

These pin the properties a training pipeline depends on — assignment
stability under corpus growth, quota determinism, bin-budget invariants,
planted-contamination detection — not just row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.contamination import ngram_contamination
from alphavantage_etl_spark.operators.sampling import (
    budget_mix,
    group_quota,
    hash_split,
    pack_bins,
    stratified_sample,
)
from alphavantage_etl_spark.operators.tfidf import tfidf_top_terms

FRACTIONS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def test_hash_split_fractions(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", FRACTIONS)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000
    # md5 buckets are uniform: 2000 rows keep each fraction within ~4 sigma
    assert 1500 < counts["train"] < 1700
    assert 130 < counts["valid"] < 270
    assert 130 < counts["test"] < 270


def test_hash_split_stable_under_corpus_growth(spark):
    """A row's split NEVER changes when other rows appear/disappear —
    the property randomSplit does not have."""
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    large = spark.range(10_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", FRACTIONS).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(large, "doc_id", FRACTIONS)
        .where(F.col("doc_id") < 100)
        .collect()
    }
    assert a == b


def test_hash_split_salt_changes_assignment(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id", FRACTIONS, salt="split")
    b = hash_split(df, "doc_id", FRACTIONS, salt="fold2")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id"
    )
    assert joined.where(F.col("sa") != F.col("sb")).count() > 0


def test_hash_split_bad_fractions_raise(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "test": 0.2})


def test_group_quota_caps_and_orders(spark):
    rows = [(i, f"s{i % 3}", float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, src string, score double")
    out = group_quota(df, "src", [F.desc("score"), F.col("id")], n=4)
    per = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert all(c == 4 for c in per.values())
    # winners are the max-score rows, ties broken by lowest id
    s0 = sorted(
        out.where(F.col("src") == "s0").select("id", "score").collect(),
        key=lambda r: r["id"],
    )
    expected = sorted(
        [r for r in rows if r[1] == "s0"], key=lambda t: (-t[2], t[0])
    )[:4]
    assert [r["id"] for r in s0] == sorted(t[0] for t in expected)


def test_pack_bins_budget_invariants(spark):
    rows = [(i, "a", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, part string, sz long")
    out = pack_bins(df, "part", "id", "sz", budget=250).collect()
    bins = {r["id"]: r["bin"] for r in out}
    # exclusive prefix: ids 0,1,2 (prior 0,100,200) -> bin 0; 3,4 -> bin 1...
    assert [bins[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_pack_bins_oversized_row_gets_own_bins(spark):
    rows = [(0, "a", 100), (1, "a", 900), (2, "a", 100)]
    df = spark.createDataFrame(rows, "id long, part string, sz long")
    bins = {r["id"]: r["bin"] for r in pack_bins(df, "part", "id", "sz", 250).collect()}
    # the 900-size row lands in the bin open at its arrival (prior=100 ->
    # bin 0); the next row starts after it: prior=1000 -> bin 4
    assert bins == {0: 0, 1: 0, 2: 4}


def test_pack_bins_partitions_do_not_interact(spark):
    rows = [(i, "a", 100) for i in range(5)] + [(i + 100, "b", 100) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, part string, sz long")
    out = pack_bins(df, "part", "id", "sz", budget=250)
    b = {(r["part"], r["id"]): r["bin"] for r in out.collect()}
    assert [b[("a", i)] for i in range(5)] == [0, 0, 0, 1, 1]
    assert [b[("b", i + 100)] for i in range(5)] == [0, 0, 0, 1, 1]


def test_stratified_sample_rates_and_default(spark):
    rows = [(i, "a" if i < 2000 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = stratified_sample(df, "src", "doc_id", {"a": 0.5}, default=0.1)
    counts = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert 900 < counts["a"] < 1100      # 50% of 2000
    assert 140 < counts["b"] < 260      # default 10% of 2000


def test_stratified_sample_stable_membership(spark):
    """A kept row stays kept when the corpus doubles — the property
    sampleBy (seeded per-partition RNG) does not have."""
    small = spark.createDataFrame(
        [(i, "a") for i in range(500)], "doc_id long, src string"
    )
    large = spark.createDataFrame(
        [(i, "a") for i in range(5000)], "doc_id long, src string"
    )
    keep_small = {r["doc_id"] for r in stratified_sample(small, "src", "doc_id", {"a": 0.3}).collect()}
    keep_large = {
        r["doc_id"]
        for r in stratified_sample(large, "src", "doc_id", {"a": 0.3})
        .where(F.col("doc_id") < 500)
        .collect()
    }
    assert keep_small == keep_large


def test_stratified_sample_bad_fraction_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, src string")
    with pytest.raises(ValueError):
        stratified_sample(df, "src", "doc_id", {"a": 1.5})


def test_budget_mix_boundary_doc_included(spark):
    # priority order by score desc: sizes 400, 400, 400 against budget 1000
    # -> priors 0, 400, 800 all < 1000; the third doc CROSSES the line but
    # is included (budgets are floors of intent); a fourth (prior 1200) is not
    rows = [(1, "a", 9.0, 400), (2, "a", 8.0, 400), (3, "a", 7.0, 400), (4, "a", 6.0, 400)]
    df = spark.createDataFrame(rows, "id long, src string, score double, n long")
    out = budget_mix(df, "src", [F.desc("score"), F.col("id")], "n", {"a": 1000})
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]


def test_budget_mix_default_budget(spark):
    rows = [(1, "a", 1.0, 100), (2, "zz", 1.0, 100), (3, "zz", 0.5, 100)]
    df = spark.createDataFrame(rows, "id long, src string, score double, n long")
    out = budget_mix(df, "src", [F.desc("score"), F.col("id")], "n", {"a": 500},
                     default_budget=100)
    # zz gets the default 100: first doc (prior 0) kept, second (prior 100) not
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_tfidf_top_terms_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
        for r in tfidf_top_terms(docs, "text", "doc_id", k=3).collect()
    }
    ln2 = round(math.log(2.0), 6)
    # "a" appears in both docs -> idf 0; "b"/"c" in one -> idf ln 2
    assert out[(1, "a")] == (2, 0.0)
    assert out[(1, "b")] == (1, ln2)
    assert out[(2, "c")] == (1, ln2)


def test_tfidf_k_bounds_output(spark):
    docs = spark.createDataFrame(
        [(1, "w x y z q r s t u v")], "doc_id long, text string"
    )
    assert tfidf_top_terms(docs, "text", "doc_id", k=4).count() == 4


def test_contamination_detects_planted_leak(spark):
    bench_text = "the quick brown fox jumps over the lazy dog near the river bank"
    # doc 4 is the canonical leak the r2 formula missed: the benchmark item
    # embedded verbatim in a ~5x-longer document. Corpus-side normalization
    # scores it |bench grams| / |doc grams| ~= 0.2 < 0.5; bench-side
    # containment scores it 1.0.
    padding = (
        "a long surrounding narrative about many unrelated topics that "
        "keeps going with plenty of additional sentences covering weather "
        "history cooking travel and various other filler subjects to make "
        "the host document several times longer than the benchmark item "
        "so that corpus-side normalization would dilute the overlap ratio"
    )
    corpus = spark.createDataFrame(
        [
            (1, f"intro text here {bench_text} and some closing words"),
            (2, "completely unrelated content about spark query planning"),
            (3, bench_text),
            (4, f"{padding} {bench_text} {padding}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "bench long, text string")
    out = ngram_contamination(
        corpus, bench.withColumnRenamed("bench", "doc_id"), "text", "doc_id",
        k=8, threshold=0.5,
    )
    got = {(r["doc_id"], r["bench_id"]): r["overlap"] for r in out.collect()}
    assert (3, 100) in got and got[(3, 100)] == 1.0
    assert (1, 100) in got and got[(1, 100)] == 1.0  # verbatim inclusion
    assert (4, 100) in got and got[(4, 100)] == 1.0  # short-bench-in-long-doc
    assert all(doc != 2 for doc, _ in got)


def test_contamination_no_benchmark_no_rows(spark):
    corpus = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    bench = corpus.where(F.lit(False))
    assert ngram_contamination(corpus, bench, "text", "doc_id").count() == 0


def test_calibrate_by_group_is_per_group(spark):
    from alphavantage_etl_spark.operators.sampling import calibrate_by_group

    # source "a" scores 1..4, source "b" scores 100..400: pooled ranking
    # would put ALL of b above a; per-group ranks must be identical
    rows = [(i, "a", float(i)) for i in range(1, 5)] + [
        (i + 10, "b", float(i) * 100) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "id long, src string, q double")
    out = calibrate_by_group(df, "src", "q", "id")
    pct = {(r["src"], r["id"]): r["score_pct"] for r in out.collect()}
    assert [pct[("a", i)] for i in range(1, 5)] == [0.0, 1 / 3, 2 / 3, 1.0]
    assert [pct[("b", i + 10)] for i in range(1, 5)] == [0.0, 1 / 3, 2 / 3, 1.0]


def test_weighted_sample_favors_heavy_rows(spark):
    from alphavantage_etl_spark.operators.sampling import weighted_sample

    # 1000 rows of weight 1, 1000 of weight 20: a 400-row sample should be
    # dominated by the heavy stratum (E[heavy] ~ 380 of 400)
    rows = [(i, 1.0) for i in range(1000)] + [(i + 1000, 20.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", n=400).collect()
    heavy = sum(1 for r in got if r["id"] >= 1000)
    assert len(got) == 400
    assert heavy > 300


def test_weighted_sample_deterministic_and_stable(spark):
    from alphavantage_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, float(i % 7 + 1)) for i in range(500)], "id long, w double")
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", n=50).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", n=50).collect())
    assert a == b
    # zero/negative weights are never sampled
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    assert [r["id"] for r in weighted_sample(df2, "id", "w", n=10).collect()] == [3]


def test_tfidf_construction_is_lazy_no_driver_action(spark, monkeypatch):
    """N must be a plan-side scalar (zero-column scan cross-joined in),
    not a driver-side docs.count() action — the r2 version paid a separate
    corpus-pass job per invocation."""
    from pyspark.sql import DataFrame

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )

    def _boom(self):
        raise AssertionError("driver-side count() during plan construction")

    monkeypatch.setattr(DataFrame, "count", _boom)
    df = tfidf_top_terms(docs, "text", "doc_id", k=2)  # must not act
    monkeypatch.undo()
    assert df.count() == 4


def test_epoch_shuffle_deterministic_and_decorrelated(spark):
    from alphavantage_etl_spark.operators.sampling import epoch_shuffle
    from alphavantage_etl_spark.sources import load

    from .conftest import SF_SMALL

    d = load(spark, SF_SMALL, "documents").select("doc_id")
    e1 = [r["doc_id"] for r in epoch_shuffle(d, "doc_id", "epoch1").collect()]
    # same seed -> identical order; layout-independent (repartition first)
    e1b = [
        r["doc_id"]
        for r in epoch_shuffle(d.repartition(7), "doc_id", "epoch1").collect()
    ]
    assert e1 == e1b and sorted(e1) != e1
    # different seed -> different permutation of the same rows
    e2 = [r["doc_id"] for r in epoch_shuffle(d, "doc_id", "epoch2").collect()]
    assert sorted(e1) == sorted(e2) and e1 != e2
    # appending rows never reorders existing rows relative to each other
    head = d.where(F.col("doc_id") < 100)
    h = [r["doc_id"] for r in epoch_shuffle(head, "doc_id", "epoch1").collect()]
    pos = {v: i for i, v in enumerate(e1)}
    assert h == sorted(h, key=lambda v: pos[v])


def test_temperature_mix_upsamples_low_resource_groups(spark):
    """alpha=0.5 smoothing: a group with 1% of the corpus gets a keep-rate
    well ABOVE a group with 99% (relative to natural share), alpha=1 keeps
    every group at exactly the natural budget fraction, and membership is
    deterministic across runs."""
    from alphavantage_etl_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 990 else "small", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    out = temperature_mix(df, "source", "doc_id", "n_chars", alpha=0.5,
                          budget_frac=0.3)
    kept = out.groupBy("source").count().collect()
    frac = {r["source"]: r["count"] for r in kept}
    # natural shares: big .99, small .01; sqrt-smoothed: sqrt(.99)/.s vs
    # sqrt(.01)/.s -> small's keep-rate ~ 9x its natural-rate treatment
    assert frac["small"] / 10 > frac["big"] / 990, (
        "low-resource group must be kept at a higher RATE"
    )
    # alpha=1: natural proportions — every group's rate == budget_frac
    nat = temperature_mix(df, "source", "doc_id", "n_chars", alpha=1.0,
                          budget_frac=0.3)
    nk = {r["source"]: r["count"]
          for r in nat.groupBy("source").count().collect()}
    assert abs(nk["big"] / 990 - 0.3) < 0.05
    # determinism: identical output on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix(
            df, "source", "doc_id", "n_chars", alpha=0.5, budget_frac=0.3
        ).collect()
    )
    assert a == b


def test_temperature_mix_validation(spark):
    from alphavantage_etl_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, source string, n_chars long"
    )
    with pytest.raises(ValueError, match="exactly one"):
        temperature_mix(df, "source", "doc_id", "n_chars")
    with pytest.raises(ValueError, match="exactly one"):
        temperature_mix(df, "source", "doc_id", "n_chars",
                        total_budget=10, budget_frac=0.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "source", "doc_id", "n_chars",
                        alpha=0.0, budget_frac=0.5)


def test_temperature_mix_corpus_never_shuffles(spark):
    """Plan shape: the corpus side reaches the filter through a BROADCAST
    join of the |groups|-row rate table — no hash-partition Exchange on
    the corpus relation (the two tiny aggregates may shuffle |groups|
    rows; that's the bounded model-state class)."""
    from alphavantage_etl_spark.operators.sampling import temperature_mix
    from alphavantage_etl_spark.sources import load

    from .conftest import SF_SMALL

    d = load(spark, SF_SMALL, "documents").select("doc_id", "source", "n_chars")
    out = temperature_mix(d, "source", "doc_id", "n_chars", budget_frac=0.4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_temporal_split_embargo_gap_is_explicit(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.sampling import temporal_split

    rows = [
        (1, dt.datetime(2024, 1, 19, 23)),  # train
        (2, dt.datetime(2024, 1, 20, 0)),   # embargo (at boundary)
        (3, dt.datetime(2024, 1, 21, 12)),  # embargo (inside gap)
        (4, dt.datetime(2024, 1, 22, 0)),   # test (at boundary+embargo)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["event_id"]: r["split"] for r in temporal_split(
        df, "ts", "2024-01-20", embargo="2 days"
    ).collect()}
    assert out == {1: "train", 2: "embargo", 3: "embargo", 4: "test"}
    # no rows silently dropped
    assert len(out) == 4


def test_temporal_split_rejects_unknown_embargo_unit(spark):
    import pytest as _pytest

    from alphavantage_etl_spark.operators.sampling import temporal_split

    df = spark.createDataFrame([(1,)], "event_id long")
    with _pytest.raises(ValueError):
        temporal_split(df, "ts", "2024-01-20", embargo="3 fortnights")
