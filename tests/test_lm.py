"""Char-n-gram LM perplexity-proxy semantics: in-distribution documents
score closer to zero than outliers; external models back off cleanly on
unseen grams; gram accounting is exact."""

from __future__ import annotations

from alphavantage_etl_spark.operators.lm import (
    lm_perplexity_scores,
    train_char_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_outlier_scores_below_in_distribution(spark):
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    out = base + [(99, "zzqxj vvkwp qqzzx jjxqv wwpqz")]
    scores = {
        r["doc_id"]: r["avg_logp"]
        for r in lm_perplexity_scores(
            _docs(spark, out), "doc_id", "text"
        ).collect()
    }
    in_dist = scores[0]
    assert scores[99] < in_dist  # gibberish is less probable
    assert all(v < 0 for v in scores.values())  # log-probs are negative


def test_n_grams_counts_overlapping_windows(spark):
    rows = [(1, "abcde"), (2, "ab")]  # 3 trigrams; sub-n doc has none...
    res = {r["doc_id"]: r["n_grams"] for r in lm_perplexity_scores(
        _docs(spark, [(1, "abcde")]), "doc_id", "text"
    ).collect()}
    assert res == {1: 3}


def test_short_doc_drops_out_gracefully(spark):
    # a doc shorter than n contributes no grams and produces no score row
    res = lm_perplexity_scores(
        _docs(spark, [(1, "abcdef"), (2, "ab")]), "doc_id", "text"
    ).collect()
    assert {r["doc_id"] for r in res} == {1}


def test_external_model_backs_off_on_unseen_grams(spark):
    ref = _docs(spark, [(1, "aaabbbccc")])
    model = train_char_lm(ref, "text", n=3, id_col="doc_id")
    target = _docs(spark, [(7, "zzzyyyxxx")])  # fully unseen
    out = lm_perplexity_scores(
        target, "doc_id", "text", model=model
    ).collect()
    assert len(out) == 1 and out[0]["n_grams"] == 7
    # unseen grams share one fallback log-prob -> avg equals it exactly
    seen_out = lm_perplexity_scores(
        ref, "doc_id", "text", model=model
    ).collect()
    assert out[0]["avg_logp"] < seen_out[0]["avg_logp"]


def test_scores_deterministic_across_runs(spark):
    d = _docs(spark, [(i, f"doc number {i} with shared words") for i in range(10)])
    a = sorted(map(tuple, lm_perplexity_scores(d, "doc_id", "text").collect()))
    b = sorted(map(tuple, lm_perplexity_scores(d, "doc_id", "text").collect()))
    assert a == b


def test_char_lm_models_merge_by_count_sum(spark):
    """Two shards' models merged by gram-count sum equal the model of the
    union — the incremental-training property (same class as the CM
    sketch's cell-sum merge)."""
    from pyspark.sql import functions as F

    a = _docs(spark, [(1, "abcabc")])
    b = _docs(spark, [(2, "bcdbcd")])
    union_model = train_char_lm(
        a.union(b), "text", n=3, id_col="doc_id"
    )
    merged = (
        train_char_lm(a, "text", n=3, id_col="doc_id")
        .union(train_char_lm(b, "text", n=3, id_col="doc_id"))
        .groupBy("gram")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, union_model.collect())) == sorted(
        map(tuple, merged.collect())
    )
