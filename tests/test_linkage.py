"""Unit semantics for fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

from alphavantage_etl_spark.operators.linkage import linkage_join


def _t(spark, rows, idc="id", namec="name"):
    return spark.createDataFrame(rows, f"{idc} long, {namec} string")


def test_prefix_edit_caught_via_suffix_key(spark):
    left = _t(spark, [(1, "Xcme Widget Company")])  # first char edited
    right = _t(spark, [(10, "Acme Widget Company"), (11, "Zeta Corp")],
               idc="rid", namec="rname")
    out = linkage_join(
        left, right, "id", "rid", "name", "rname", block=4, threshold=0.8
    ).collect()
    assert len(out) == 1 and out[0]["rid"] == 10


def test_both_ends_edit_evades_blocking(spark):
    # edits in BOTH the prefix and the suffix: the documented recall trade
    left = _t(spark, [(1, "Xcme Widget CompanX")])
    right = _t(spark, [(10, "Acme Widget Company")], idc="rid", namec="rname")
    out = linkage_join(
        left, right, "id", "rid", "name", "rname", block=4, threshold=0.8
    ).collect()
    assert out == []


def test_hot_block_capped(spark):
    # 20 left rows share the prefix "corp"; cap 10 drops that key, and
    # with distinct suffixes nothing pairs — the quadratic never runs
    left = _t(spark, [(i, f"corp entity number {i:04d}") for i in range(20)])
    right = _t(spark, [(100 + i, f"corp entity number {i:04d}")
                       for i in range(20)], idc="rid", namec="rname")
    capped = linkage_join(
        left, right, "id", "rid", "name", "rname",
        block=4, max_block=10, threshold=0.9,
    ).collect()
    # suffix keys (distinct per i) still link each pair exactly
    assert len(capped) == 20
    assert all(r["rid"] == r["id"] + 100 and r["name_sim"] == 1.0
               for r in capped)


def test_best_match_deterministic_tie_on_id(spark):
    left = _t(spark, [(1, "alpha beta")])
    # two equally-similar right rows: the smaller id wins
    right = _t(spark, [(21, "alpha betX"), (20, "alpha betY")],
               idc="rid", namec="rname")
    out = linkage_join(
        left, right, "id", "rid", "name", "rname", block=4, threshold=0.5
    ).collect()
    assert len(out) == 1 and out[0]["rid"] == 20


def test_threshold_filters_weak_matches(spark):
    left = _t(spark, [(1, "alpha")])
    right = _t(spark, [(10, "alpXX")], idc="rid", namec="rname")
    hi = linkage_join(left, right, "id", "rid", "name", "rname",
                      block=3, threshold=0.9).collect()
    lo = linkage_join(left, right, "id", "rid", "name", "rname",
                      block=3, threshold=0.5).collect()
    assert hi == [] and len(lo) == 1


def test_short_names_whole_string_key(spark):
    # names shorter than the block width: left/right keep the whole
    # string as the key on both engines
    left = _t(spark, [(1, "ab")])
    right = _t(spark, [(10, "ab")], idc="rid", namec="rname")
    out = linkage_join(left, right, "id", "rid", "name", "rname",
                       block=4, threshold=0.9).collect()
    assert len(out) == 1 and out[0]["name_sim"] == 1.0
