"""Unit semantics for the r4 pipeline operators: chunking, bloom pruning,
SCD2 / dataset diff, count-min sketch, anomaly flagging, inverted index.

The contract queries pin each operator's fixture-level arithmetic against
the DuckDB oracle (test_contract_queries); these tests pin the operator
PROPERTIES on crafted frames — coverage/overlap invariants, no false
negatives, mergeability, planted defects caught.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.anomaly import flag_anomalies
from alphavantage_etl_spark.operators.chunking import chunk_documents
from alphavantage_etl_spark.operators.history import dataset_diff, scd2_build
from alphavantage_etl_spark.operators.postings import build_inverted_index
from alphavantage_etl_spark.operators.pruning import (
    bloom_filter_build,
    bloom_might_contain,
    bloom_semi_join,
)
from alphavantage_etl_spark.operators.sketches import (
    cm_estimate,
    count_min_sketch,
    topk_terms,
)


# ---------------------------------------------------------------- chunking
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(20))
    out = chunk_documents(
        _docs(spark, [(1, text)]), "text", "doc_id", window=8, stride=4
    ).collect()
    # starts 0,4,8,12,16 -> 5 chunks; final chunk is the 4-token tail
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in out] == [8, 8, 8, 8, 4]
    assert out[0]["chunk_text"].split(" ") == [f"t{i}" for i in range(8)]
    # overlap: chunk k repeats the last (window - stride) tokens of chunk k-1
    assert out[1]["chunk_text"].split(" ")[:4] == out[0]["chunk_text"].split(" ")[4:]
    # every token appears in at least one chunk
    seen = {t for r in out for t in r["chunk_text"].split(" ")}
    assert seen == {f"t{i}" for i in range(20)}


def test_chunk_short_doc_single_partial_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), "text", "doc_id", window=8, stride=4
    ).collect()
    assert len(out) == 1
    assert out[0]["n_tokens"] == 3 and out[0]["chunk_text"] == "a b c"


def test_chunk_disjoint_when_stride_equals_window(spark):
    text = " ".join(str(i) for i in range(9))
    out = chunk_documents(
        _docs(spark, [(1, text)]), "text", "doc_id", window=3, stride=3
    ).collect()
    texts = [r["chunk_text"] for r in out]
    assert texts == ["0 1 2", "3 4 5", "6 7 8"]


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), "text", "doc_id", window=0)


# ------------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_prunes(spark):
    dim = spark.range(0, 200).select((F.col("id") * 7).alias("k"))
    bitmap = bloom_filter_build(dim, "k", num_bits=1 << 12)
    # every inserted key tests positive
    hits = dim.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    assert hits == 200
    # a disjoint key universe is mostly pruned (FP rate < ~5% at this fill)
    probe = spark.range(100_000, 101_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    assert fp < 100


def test_bloom_semi_join_is_exact(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("fk"), (F.col("id") % 10).alias("grp")
    )
    dim = spark.range(0, 500).select((F.col("id") * 9).alias("dk"))
    got = bloom_semi_join(fact, dim, "fk", "dk", num_bits=1 << 12)
    want = fact.join(
        dim.select(F.col("dk").alias("fk")).dropDuplicates(),
        on="fk",
        how="left_semi",
    )
    assert sorted(r["fk"] for r in got.collect()) == sorted(
        r["fk"] for r in want.collect()
    )


def test_bloom_build_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError):
        bloom_filter_build(spark.range(1), "id", num_bits=100)


# -------------------------------------------------------------- scd2/diff
def test_scd2_compresses_and_builds_half_open_intervals(spark):
    rows = [
        # key 1: A A B A -> versions A[1,3) B[3,4) A[4,None)
        (1, 1, "A", 101), (1, 2, "A", 102), (1, 3, "B", 103), (1, 4, "A", 104),
        # key 2: constant -> one current version
        (2, 1, "X", 201), (2, 2, "X", 202),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, v string, eid long")
    out = scd2_build(df, "k", "ts", ["v"], tiebreak_col="eid").collect()
    k1 = sorted(
        [(r["v"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out if r["k"] == 1]
    , key=lambda t: t[1])
    assert k1 == [("A", 1, 3, False), ("B", 3, 4, False), ("A", 4, None, True)]
    k2 = [(r["v"], r["valid_from"], r["valid_to"], r["is_current"])
          for r in out if r["k"] == 2]
    assert k2 == [("X", 1, None, True)]


def test_scd2_null_value_transitions_are_nullsafe(spark):
    rows = [(1, 1, None, 1), (1, 2, None, 2), (1, 3, "A", 3)]
    df = spark.createDataFrame(rows, "k long, ts long, v string, eid long")
    out = sorted(
        scd2_build(df, "k", "ts", ["v"], tiebreak_col="eid").collect(),
        key=lambda r: r["valid_from"],
    )
    # the two NULLs compress into one version
    assert [(r["v"], r["valid_from"]) for r in out] == [(None, 1), ("A", 3)]


def test_dataset_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0)], "k long, v double"
    )
    out = {r["k"]: r["status"]
           for r in dataset_diff(old, new, ["k"], ["v"]).collect()}
    # 1 removed, 2 changed, 3 unchanged (NULL == NULL null-safely), 4 added
    assert out == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}


# ---------------------------------------------------------------- sketches
def test_cm_estimate_never_undercounts_any_term(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3)).strip()) for i in range(1, 60)],
        "doc_id long, text string",
    )
    sketch = count_min_sketch(docs, "text", depth=4, width=64)
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    est = cm_estimate(sketch, exact.select("term"), "term", depth=4, width=64)
    joined = exact.join(est, on="term").collect()
    assert joined and all(
        r["cm_estimate"] >= r["occurrences"] for r in joined
    )


def test_cm_sketch_merges_by_cell_sum(spark):
    a = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "y z")], "doc_id long, text string")
    sk_union = count_min_sketch(a.union(b), "text", depth=2, width=32)
    merged = (
        count_min_sketch(a, "text", depth=2, width=32)
        .union(count_min_sketch(b, "text", depth=2, width=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, sk_union.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_topk_terms_orders_and_tiebreaks(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    out = [tuple(r) for r in topk_terms(docs, "text", k=2).collect()]
    assert out == [("a", 2), ("b", 2)]  # tie broken lexically


# ----------------------------------------------------------------- anomaly
def test_anomaly_planted_spike_is_flagged(spark):
    # 20 steady readings then a spike; z of the spike is huge
    rows = [(i, 7, i, 10.0) for i in range(20)] + [(20, 7, 20, 300.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    out = flag_anomalies(
        df, "user_id", "ts", "value", "event_id", min_history=8
    ).collect()
    assert [r["event_id"] for r in out] == [20]
    assert out[0]["baseline_n"] == 20


def test_anomaly_needs_min_history_and_ignores_steady_noise(spark):
    # fewer than min_history readings -> nothing scored, even a spike
    rows = [(i, 1, i, 10.0) for i in range(5)] + [(5, 1, 5, 500.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    assert (
        flag_anomalies(
            df, "user_id", "ts", "value", "event_id", min_history=8
        ).count()
        == 0
    )


# ---------------------------------------------------------------- postings
def test_inverted_index_caps_and_sorts_postings(spark):
    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 3 else f"only{i}"))
         for i in range(12, 0, -1)],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in build_inverted_index(
        docs, "doc_id", "text", min_df=1, postings_cap=5
    ).collect()}
    assert out["common"]["df"] == 12
    # capped at 5, ascending despite descending input order
    assert out["common"]["postings"] == "1,2,3,4,5"
    assert out["rare"]["postings"] == "3"


def test_inverted_index_df_gates(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a b")], "doc_id long, text string"
    )
    terms = {r["term"] for r in build_inverted_index(
        docs, "doc_id", "text", min_df=2, max_df=2
    ).collect()}
    assert terms == {"b"}  # a: df=3 > max_df; c: df=1 < min_df


# ------------------------------------------------------------- plan shapes
def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_plan_has_no_shuffle(spark):
    from alphavantage_etl_spark.sources import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    plan = _plan(chunk_documents(d, "text", "doc_id"))
    assert "Exchange" not in plan, plan[:2000]
    assert "Generate" in plan  # the posexplode — the operator's only node class


def test_scd2_plan_single_exchange(spark):
    from alphavantage_etl_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    plan = _plan(scd2_build(ev, "user_id", "ts", ["event_type"], "event_id"))
    # both windows (compression lag + interval lead) share one (key) shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_anomaly_plan_single_exchange_no_python(spark):
    from alphavantage_etl_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    plan = _plan(
        flag_anomalies(ev, "user_id", "ts", "value", "event_id")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan


def test_funnel_plan_one_key_shuffle(spark):
    from alphavantage_etl_spark.operators.cohorts import funnel_steps
    from alphavantage_etl_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    plan = _plan(
        funnel_steps(ev, "user_id", "ts", "event_type", ["view", "click"])
    )
    # one hash shuffle on the entity key; the chain walk adds none
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cm_sketch_partial_agg_before_exchange(spark):
    from alphavantage_etl_spark.sources import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    plan = _plan(count_min_sketch(d, "text"))
    # the (row, bucket) explode feeds a map-side partial HashAggregate, so
    # the exchange carries at most depth*width rows per task
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.index("Generate") > plan.index("Exchange"), (
        "explode must sit below the exchange (map side)"
    )


def test_bloom_predicate_is_map_side(spark):
    fact = spark.range(0, 1000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 50).select((F.col("id") * 3).alias("dk"))
    out = bloom_semi_join(fact, dim, "fk", "dk", num_bits=1 << 12)
    plan = _plan(out)
    # the literal-bitmap membership test compiles into the plan as bit_get
    # over the fact scan (below the join in the printed tree)
    assert "bit_get" in plan, plan[:2000]
    join_at = min(
        (plan.index(j) for j in ("SortMergeJoin", "BroadcastHashJoin",
                                 "ShuffledHashJoin") if j in plan),
        default=-1,
    )
    assert join_at != -1 and plan.index("bit_get") > join_at, (
        "bloom filter must evaluate below/before the join"
    )


def test_chunk_delimiter_is_literal_not_regex(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a.b.c")]), "text", "doc_id",
        window=8, stride=8, delimiter=".",
    ).collect()
    assert out[0]["chunk_text"] == "a.b.c" and out[0]["n_tokens"] == 3


def test_history_ops_reject_empty_column_lists(spark):
    df = spark.createDataFrame([(1, 1, "A")], "k long, ts long, v string")
    with pytest.raises(ValueError):
        scd2_build(df, "k", "ts", [])
    with pytest.raises(ValueError):
        dataset_diff(df, df, ["k"], [])


# --------------------------------------------------------------- sparsesim
def test_sparse_topk_identical_doc_scores_one(spark):
    from alphavantage_etl_spark.operators.sparsesim import sparse_tfidf_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "alpha delta delta"), (4, "zeta zeta zeta")],
        "doc_id long, text string",
    )
    out = sparse_tfidf_topk(docs, "doc_id", "text", query_id=1, k=10).collect()
    sims = {r["doc_id"]: r["sim"] for r in out}
    assert 1 not in sims                  # query excluded
    assert sims[2] == 1.0                 # identical text -> cosine 1
    assert 4 not in sims                  # no shared terms -> no candidate
    assert 0 < sims[3] < 1.0
    # ranked descending
    assert [r["doc_id"] for r in out] == sorted(
        sims, key=lambda d: (-sims[d], d)
    )


@pytest.mark.slow
def test_sparse_topk_k_bounds_output(spark):
    from alphavantage_etl_spark.operators.sparsesim import sparse_tfidf_topk

    docs = spark.createDataFrame(
        [(i, "shared word plus w%d" % i) for i in range(30)],
        "doc_id long, text string",
    )
    out = sparse_tfidf_topk(docs, "doc_id", "text", query_id=0, k=5).collect()
    assert len(out) == 5


# ------------------------------------------------------------------- trend
def test_group_trend_recovers_exact_line(spark):
    from alphavantage_etl_spark.operators.trend import group_trend

    rows = [("a", x, 2.5 * x + 7.0) for x in range(10)] + [
        ("flat", x, 42.0) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = {r["g"]: r for r in group_trend(df, "g", "x", "y").collect()}
    assert (out["a"]["slope"], out["a"]["intercept"]) == (2.5, 7.0)
    assert (out["flat"]["slope"], out["flat"]["intercept"]) == (0.0, 42.0)


def test_group_trend_degenerate_groups_yield_null(spark):
    from alphavantage_etl_spark.operators.trend import group_trend

    # single point and zero x-variance: no OLS line
    rows = [("one", 3, 5.0), ("same_x", 1, 1.0), ("same_x", 1, 9.0)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = {r["g"]: r for r in group_trend(df, "g", "x", "y").collect()}
    assert out["one"]["slope"] is None and out["same_x"]["slope"] is None


def test_group_trend_invariant_to_partitioning(spark):
    from alphavantage_etl_spark.operators.trend import group_trend

    rows = [("a", x, 0.01 * x * x) for x in range(50)]  # nonlinear data
    df = spark.createDataFrame(rows, "g string, x long, y double")
    one = group_trend(df.coalesce(1), "g", "x", "y").collect()[0]
    many = group_trend(df.repartition(16), "g", "x", "y").collect()[0]
    assert (one["slope"], one["intercept"]) == (many["slope"], many["intercept"])


# ------------------------------------------------------------- scd2 lookup
def test_scd2_lookup_point_in_time_semantics(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.history import (
        scd2_build,
        scd2_lookup,
    )

    def t(day, h=0):
        return dt.datetime(2024, 1, day, h)

    changes = spark.createDataFrame(
        [(1, t(1), "bronze", 1), (1, t(10), "silver", 2), (1, t(20), "gold", 3)],
        "k long, ts timestamp, tier string, eid long",
    )
    dim = scd2_build(changes, "k", "ts", ["tier"], tiebreak_col="eid")
    points = spark.createDataFrame(
        [
            (100, 1, t(5)),    # inside bronze
            (101, 1, t(10)),   # exactly at the boundary -> NEW version
            (102, 1, t(15)),   # inside silver
            (103, 1, t(25)),   # open current version (gold)
        ],
        "pid long, k long, ts timestamp",
    )
    out = {r["pid"]: r["tier"]
           for r in scd2_lookup(points, dim, "k", "ts").collect()}
    assert out == {100: "bronze", 101: "silver", 102: "silver", 103: "gold"}


def test_scd2_lookup_drops_points_before_history_starts(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.history import (
        scd2_build,
        scd2_lookup,
    )

    changes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10), "v1", 1)],
        "k long, ts timestamp, v string, eid long",
    )
    dim = scd2_build(changes, "k", "ts", ["v"], tiebreak_col="eid")
    points = spark.createDataFrame(
        [(9, 1, dt.datetime(2024, 1, 1))], "pid long, k long, ts timestamp"
    )
    # no version was true before the first valid_from: inner-join drops it
    # (leaking the LATER version backward would be the feature-store bug)
    assert scd2_lookup(points, dim, "k", "ts").count() == 0


# ------------------------------------------------------- PMI collocations
def test_collocations_known_pmi(spark):
    import math

    from alphavantage_etl_spark.operators.tfidf import collocations

    # "new york" always adjacent; "the cat" mixes freely with fillers
    docs = spark.createDataFrame(
        [("new york " * 5).strip() for _ in range(2)]
        + ["the cat sat on the mat the cat"],
        "string",
    ).toDF("text")
    out = collocations(docs, "text", min_count=2, k=10).collect()
    by_pair = {(r["a"], r["b"]): r for r in out}
    assert ("new", "york") in by_pair
    r = by_pair[("new", "york")]
    # exact fixture arithmetic: U(new)=U(york)=10, B=10, N1=28, N2=25
    expected = math.log((10 / 25) / ((10 / 28) * (10 / 28)))
    assert abs(r["pmi"] - expected) < 1e-8
    # PMI favors pairs whose co-occurrence beats their unigram product:
    # (the, cat) has rare unigrams (3 and 2 of 28) but always co-occurs,
    # so it outranks the frequent-unigram (new, york) — pin that exact
    # value too (B=2, N2=25)
    expected_tc = math.log((2 / 25) / ((3 / 28) * (2 / 28)))
    assert abs(by_pair[("the", "cat")]["pmi"] - expected_tc) < 1e-8
    assert by_pair[("the", "cat")]["pmi"] > r["pmi"]


def test_collocations_min_count_gates_hapax(spark):
    from alphavantage_etl_spark.operators.tfidf import collocations

    docs = spark.createDataFrame(
        [("rare pair",), ("common duo common duo common duo",)],
        "text string",
    )
    out = collocations(docs, "text", min_count=2, k=10).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert ("rare", "pair") not in pairs  # hapax gated
    assert ("common", "duo") in pairs


def test_collocations_single_token_docs_safe(spark):
    from alphavantage_etl_spark.operators.tfidf import collocations

    docs = spark.createDataFrame(
        [("solo",), ("",), ("a b a b a b",)], "text string"
    )
    out = collocations(docs, "text", min_count=2, k=5).collect()
    assert {(r["a"], r["b"]) for r in out} >= {("a", "b")}


# -------------------------------------------------- mergeable agg state
def test_agg_state_merge_equals_recompute(spark):
    from alphavantage_etl_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_states,
    )

    rows = [(i, f"g{i % 3}", float(i) + 0.25) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    ks = ["g"]
    direct = sorted(finalize_state(aggregate_state(df, ks, "v"), ks).collect())
    # three arbitrary disjoint slices, merged in a different order
    s1 = aggregate_state(df.where("id % 3 = 0"), ks, "v")
    s2 = aggregate_state(df.where("id % 3 = 1"), ks, "v")
    s3 = aggregate_state(df.where("id % 3 = 2"), ks, "v")
    merged = sorted(
        finalize_state(merge_states(ks, s3, s1, s2), ks).collect()
    )
    assert merged == direct


def test_agg_state_one_sided_groups_and_nulls(spark):
    from alphavantage_etl_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_states,
    )

    a = spark.createDataFrame(
        [("only_a", 1.0), ("both", 2.0)], "g string, v double"
    )
    b = spark.createDataFrame(
        [("both", 4.0), ("only_b", None)], "g string, v double"
    )
    ks = ["g"]
    out = {
        r["g"]: r
        for r in finalize_state(
            merge_states(
                ks, aggregate_state(a, ks, "v"), aggregate_state(b, ks, "v")
            ),
            ks,
        ).collect()
    }
    assert out["both"]["n"] == 2 and out["both"]["avg"] == 3.0
    assert out["only_a"]["avg"] == 1.0
    # all-null group: counted, but no fabricated average
    assert out["only_b"]["n"] == 1 and out["only_b"]["avg"] is None


def test_agg_state_merge_rejects_empty_arglist(spark):
    import pytest as _pytest

    from alphavantage_etl_spark.operators.incremental import merge_states

    with _pytest.raises(ValueError):
        merge_states(["g"])


# ------------------------------------------------------------ join profile
def test_join_profile_known_values(spark):
    from alphavantage_etl_spark.operators.history import join_profile

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (9,)], "k long"
    )
    r = join_profile(left, right, "k", "k").first()
    assert r["n_left"] == 5 and r["n_right"] == 5
    assert r["n_keys_left"] == 3 and r["n_keys_right"] == 3
    assert r["n_keys_shared"] == 2  # keys 1 and 2
    # orphans count ROWS: left key 3 (1 row) + the NULL-keyed row
    assert r["orphans_left"] == 2
    assert r["orphans_right"] == 1  # key 9
    assert r["max_fanout_left"] == 2 and r["max_fanout_right"] == 3
    # exact inner-join size: key1 2x1 + key2 1x3 = 5
    assert r["est_join_rows"] == "5"


def test_join_profile_disjoint_and_empty(spark):
    from alphavantage_etl_spark.operators.history import join_profile

    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(8,), (9,)], "k long")
    r = join_profile(left, right, "k", "k").first()
    assert r["n_keys_shared"] == 0 and r["est_join_rows"] == "0"
    assert r["orphans_left"] == 2 and r["orphans_right"] == 2
    assert r["max_fanout_left"] == 0 and r["max_fanout_right"] == 0


# --------------------------------------------------- Poisson bootstrap
def test_bootstrap_ci_brackets_mean_and_narrows_with_n(spark):
    from alphavantage_etl_spark.operators.bootstrap import (
        poisson_bootstrap_mean,
    )

    small = spark.createDataFrame(
        [(i, "g", float(i % 10)) for i in range(40)], "id long, g string, v double"
    )
    big = spark.createDataFrame(
        [(i, "g", float(i % 10)) for i in range(4000)], "id long, g string, v double"
    )
    rs = poisson_bootstrap_mean(small, "id", "v", "g", n_replicates=60).first()
    rb = poisson_bootstrap_mean(big, "id", "v", "g", n_replicates=60).first()
    for r in (rs, rb):
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # 100x the data -> a much tighter interval around the same mean
    assert (rb["ci_hi"] - rb["ci_lo"]) < (rs["ci_hi"] - rs["ci_lo"]) / 3


def test_bootstrap_weights_are_poissonish_and_deterministic(spark):
    from pyspark.sql import functions as F

    from alphavantage_etl_spark.operators.bootstrap import (
        _LADDER,
        poisson_bootstrap_mean,
    )

    # the ladder itself: mean weight over many (r, id) draws ~ 1
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(2000)], "id long, g string, v double"
    )
    a = sorted(map(tuple, poisson_bootstrap_mean(
        df, "id", "v", "g", n_replicates=20).collect()))
    b = sorted(map(tuple, poisson_bootstrap_mean(
        df.repartition(7), "id", "v", "g", n_replicates=20).collect()))
    assert a == b  # content-addressed: layout-independent
    assert len(_LADDER) == 7  # protocol constant pinned


def test_bootstrap_rejects_degenerate_replicates(spark):
    import pytest as _pytest

    from alphavantage_etl_spark.operators.bootstrap import (
        poisson_bootstrap_mean,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError):
        poisson_bootstrap_mean(df, "id", "v", n_replicates=1)
    # ungrouped form works and brackets the trivial mean
    r = poisson_bootstrap_mean(df, "id", "v", n_replicates=10).first()
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]


# ----------------------------------------------------- CUSUM change point
def test_change_point_finds_planted_shift(spark):
    from alphavantage_etl_spark.operators.anomaly import change_point

    # mean 10 for t=1..30, mean 50 for t=31..60: the split is at t=30
    rows = [("s", i, 10.0 if i <= 30 else 50.0) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = change_point(df, "k", "t", "v").first()
    assert r["t"] == 30 and r["n"] == 60
    assert r["mean_before"] == 10.0 and r["mean_after"] == 50.0
    assert r["shift"] == 40.0


def test_change_point_ties_earliest_and_keys_isolated(spark):
    from alphavantage_etl_spark.operators.anomaly import change_point

    # constant series: every |c_t| is 0 — tie resolves to the EARLIEST t
    rows = [("flat", i, 7.0) for i in range(1, 11)] + [
        ("step", i, 0.0 if i <= 5 else 100.0) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["k"]: r for r in change_point(df, "k", "t", "v").collect()}
    assert out["flat"]["t"] == 1 and out["flat"]["shift"] == 0.0
    assert out["step"]["t"] == 5 and out["step"]["shift"] == 100.0
    # single-point series yields no row (no valid split)
    single = spark.createDataFrame([("one", 1, 5.0)], "k string, t long, v double")
    assert change_point(single, "k", "t", "v").collect() == []


# ------------------------------------------------------------- Zipf fit
def test_zipf_fit_recovers_planted_power_law(spark):
    from alphavantage_etl_spark.operators.tfidf import zipf_fit

    # term w_r appears round(1000/r) times -> exact Zipf, slope -> -1
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 / r)
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    r = zipf_fit(docs, "text", top_k=100).first()
    assert r["n_terms"] == 20
    assert -1.05 < r["slope"] < -0.95  # rounding of 1000/r bends it slightly


def test_zipf_fit_flat_corpus_slope_zero(spark):
    from alphavantage_etl_spark.operators.tfidf import zipf_fit

    # every term equally frequent: ln(f) constant -> slope exactly 0
    docs = spark.createDataFrame(
        [(" ".join(f"t{i}" for i in range(10)) + " ") * 3], "string"
    ).toDF("text")
    r = zipf_fit(docs, "text", top_k=50).first()
    assert r["slope"] == 0.0
