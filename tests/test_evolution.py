"""X129-X132: schema conformance policy, drift report, MERGE-shaped
upsert, CDC changelog apply — semantics pinned by example, plan shapes
pinned for the target-never-shuffles contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.evolution import (
    conform_schema,
    schema_drift_report,
    upsert_merge,
)

TARGET = "doc_id bigint, lang string, n_chars bigint"


def _drifted(spark):
    # renamed (length->n_chars as int), missing (lang), extra (crawl_ts)
    return spark.createDataFrame(
        [Row(doc_id=1, length=10, crawl_ts="t1"), Row(doc_id=2, length=None, crawl_ts="t2")]
    )


def test_conform_renames_fills_and_drops(spark):
    out = conform_schema(
        _drifted(spark), TARGET, renames={"length": "n_chars"}
    )
    assert out.columns == ["doc_id", "lang", "n_chars"]
    assert dict(out.dtypes) == {
        "doc_id": "bigint",
        "lang": "string",
        "n_chars": "bigint",
    }
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["lang"] is None and rows[1]["n_chars"] == 10
    assert rows[2]["n_chars"] is None


def test_conform_keep_extra_appends_after_target(spark):
    out = conform_schema(
        _drifted(spark),
        TARGET,
        renames={"length": "n_chars"},
        on_extra="keep",
    )
    assert out.columns == ["doc_id", "lang", "n_chars", "crawl_ts"]


def test_conform_error_policies_raise(spark):
    with pytest.raises(ValueError, match="missing"):
        conform_schema(
            _drifted(spark), TARGET, renames={"length": "n_chars"},
            on_missing="error",
        )
    with pytest.raises(ValueError, match="absent from the target"):
        conform_schema(
            _drifted(spark), TARGET, renames={"length": "n_chars"},
            on_extra="error",
        )
    with pytest.raises(ValueError, match="renames"):
        conform_schema(_drifted(spark), TARGET, renames={"length": "nope"})
    with pytest.raises(ValueError):
        conform_schema(_drifted(spark), TARGET, on_missing="bogus")


def test_conform_is_pure_projection(spark):
    plan = (
        conform_schema(_drifted(spark), TARGET, renames={"length": "n_chars"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_drift_report_statuses_and_counts(spark):
    got = {
        r["col_name"]: (r["status"], r["source_name"], r["n_nonnull"])
        for r in schema_drift_report(
            _drifted(spark), TARGET, renames={"length": "n_chars"}
        ).collect()
    }
    assert got == {
        "doc_id": ("ok", "doc_id", 2),
        "lang": ("missing", None, 0),
        "n_chars": ("renamed", "length", 1),  # one NULL length
        "crawl_ts": ("extra", "crawl_ts", 2),
    }


def test_drift_report_retyped(spark):
    df = spark.createDataFrame([Row(doc_id="1"), Row(doc_id="x")])
    got = {
        r["col_name"]: (r["status"], r["n_nonnull"])
        for r in schema_drift_report(df, "doc_id bigint").collect()
    }
    # 'x' does not cast to bigint -> post-conformance non-null count is 1
    assert got == {"doc_id": ("retyped", 1)}


def _merge_fixture(spark):
    target = spark.createDataFrame(
        [(k, 2020 + k % 3, float(k) * 10) for k in range(1, 11)],
        "k long, part int, v double",
    )
    source = spark.createDataFrame(
        [
            (3, 2020 + 3 % 3, 999.0, False),   # update
            (42, 2021, 1.0, False),            # insert
            (7, 2020 + 7 % 3, 0.0, True),      # delete
            (9, 2020 + 9 % 3, 123.0, None),    # NULL flag = keep (update)
        ],
        "k long, part int, v double, del boolean",
    )
    want = {k: float(k) * 10 for k in range(1, 11)}
    want[3] = 999.0
    want[42] = 1.0
    want[9] = 123.0
    del want[7]
    return target, source, want


def test_upsert_update_insert_delete(spark):
    target, source, want = _merge_fixture(spark)
    out = upsert_merge(target, source, ["k"], delete_col="del")
    assert {r["k"]: r["v"] for r in out.collect()} == want
    assert set(out.columns) == {"k", "part", "v"}


def test_upsert_partitioned_matches_simple(spark):
    target, source, want = _merge_fixture(spark)
    out = upsert_merge(
        target, source, ["k"], delete_col="del", partition_col="part"
    )
    assert {r["k"]: r["v"] for r in out.collect()} == want


def test_upsert_duplicate_source_keys_raise(spark):
    target, _, _ = _merge_fixture(spark)
    dup = spark.createDataFrame(
        [(3, 2020, 1.0, False), (3, 2020, 2.0, False)],
        "k long, part int, v double, del boolean",
    )
    with pytest.raises(Exception, match="duplicate keys"):
        upsert_merge(target, dup, ["k"], delete_col="del").count()


def test_upsert_plan_broadcasts_small_delta(spark):
    """The 100 TB contract: the target side flows through a BROADCAST
    anti-join on the small source key set — never a shuffled join of the
    target — and no hint forces it (AQE may degrade a huge delta)."""
    target, source, _ = _merge_fixture(spark)
    out = upsert_merge(target, source, ["k"], delete_col="del")
    out.collect()  # in-memory frames have no stats: AQE decides at runtime
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "LeftAnti" in final
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def _cdc_fixture(spark):
    target = spark.createDataFrame(
        [(k, float(k) * 10) for k in range(1, 6)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [
            # key 2: U then D -> net delete
            (2, 100.0, 1, "U"),
            (2, 0.0, 2, "D"),
            # key 3: D then U (re-insert) -> net upsert with seq-2 image
            (3, 0.0, 1, "D"),
            (3, 333.0, 2, "U"),
            # key 9: brand-new insert
            (9, 90.0, 1, "I"),
            # key 4: NULL seq loses to a dated event
            (4, -1.0, None, "U"),
            (4, 444.0, 5, "U"),
        ],
        "k long, v double, seq long, op string",
    )
    want = {1: 10.0, 3: 333.0, 4: 444.0, 5: 50.0, 9: 90.0}
    return target, changes, want


def test_apply_changelog_latest_event_wins(spark):
    from alphavantage_etl_spark.operators.evolution import apply_changelog

    target, changes, want = _cdc_fixture(spark)
    out = apply_changelog(target, changes, ["k"], "seq", "op")
    assert {r["k"]: r["v"] for r in out.collect()} == want
    assert out.columns == target.columns


def test_apply_changelog_duplicate_seq_raises(spark):
    from alphavantage_etl_spark.operators.evolution import apply_changelog

    target, _, _ = _cdc_fixture(spark)
    dup = spark.createDataFrame(
        [(2, 1.0, 7, "U"), (2, 2.0, 7, "U")],
        "k long, v double, seq long, op string",
    )
    with pytest.raises(Exception, match="duplicate"):
        apply_changelog(target, dup, ["k"], "seq", "op").count()
    # two undated events for one key are just as ambiguous
    nulls = spark.createDataFrame(
        [(2, 1.0, None, "U"), (2, 2.0, None, "U")],
        "k long, v double, seq long, op string",
    )
    with pytest.raises(Exception, match="duplicate"):
        apply_changelog(target, nulls, ["k"], "seq", "op").count()


def test_apply_changelog_unknown_op_raises(spark):
    from alphavantage_etl_spark.operators.evolution import apply_changelog

    target, _, _ = _cdc_fixture(spark)
    bad = spark.createDataFrame(
        [(2, 1.0, 7, "X")], "k long, v double, seq long, op string"
    )
    with pytest.raises(Exception, match="unknown op"):
        apply_changelog(target, bad, ["k"], "seq", "op").count()


def test_apply_changelog_plan_no_window_no_sort_on_changes(spark):
    """The net-effect reduction must be a partial-aggregated max_by on
    the key — no Window, no per-key sort — so million-event churn keys
    never funnel into one task."""
    from alphavantage_etl_spark.operators.evolution import apply_changelog

    target, changes, _ = _cdc_fixture(spark)
    plan = (
        apply_changelog(target, changes, ["k"], "seq", "op")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_max_by" in plan


def test_conform_ambiguous_renames_raise(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, len_v1=5, len_v2=7)]
    )
    with pytest.raises(ValueError, match="same target"):
        conform_schema(
            df, "doc_id bigint, n_chars bigint",
            renames={"len_v1": "n_chars", "len_v2": "n_chars"},
        )


def test_validate_partition_stability_finds_moves(spark):
    """The partition-scoped MERGE precondition (partition immutable per
    key) is a declared constraint — the validator is the key-level pass
    that proves a layout safe, and a cross-partition move in the
    partitioned form would otherwise duplicate the key (which is why
    the docstring sends movers to partition_col=None)."""
    from alphavantage_etl_spark.operators.evolution import (
        validate_partition_stability,
    )

    target, source, want = _merge_fixture(spark)
    assert (
        validate_partition_stability(target, source, ["k"], "part").count()
        == 0
    )
    # the unpartitioned form handles a mover correctly...
    mover = spark.createDataFrame(
        [(3, 9999, 1.0, False)], "k long, part int, v double, del boolean"
    )
    out = upsert_merge(target, mover, ["k"], delete_col="del")
    rows = [r for r in out.collect() if r["k"] == 3]
    assert len(rows) == 1 and rows[0]["part"] == 9999
    # ...and the validator flags it for the partitioned form
    v = validate_partition_stability(target, mover, ["k"], "part").collect()
    assert [(r["k"], r["target_part"], r["source_part"]) for r in v] == [
        (3, 2020, 9999)
    ]


def test_upsert_partitioned_null_partition_keys(spark):
    """The r10 advisor's HIGH finding: with partition_col, a NULL
    partition value must still route its target rows through the merge
    — a plain equi-join split never matches NULL, so the old row
    survived next to the update (silent duplicate) and a delete was a
    no-op. The split is now null-safe."""
    from alphavantage_etl_spark.operators.evolution import upsert_merge

    target = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, 2020, 30.0)],
        "k long, part int, v double",
    )
    source = spark.createDataFrame(
        [(1, None, 111.0, False), (2, None, 0.0, True)],
        "k long, part int, v double, del boolean",
    )
    out = upsert_merge(
        target, source, ["k"], delete_col="del", partition_col="part"
    )
    rows = {r["k"]: (r["part"], r["v"]) for r in out.collect()}
    # update replaced (no duplicate), delete removed, other part untouched
    assert out.count() == 2
    assert rows == {1: (None, 111.0), 3: (2020, 30.0)}
    # and parity with the unpartitioned form on the same inputs
    simple = upsert_merge(target, source, ["k"], delete_col="del")
    assert {r["k"]: (r["part"], r["v"]) for r in simple.collect()} == rows


def test_net_changes_min_long_seq_beats_null(spark):
    """Sequence ordering is (has-seq, seq), not a MIN_LONG sentinel: a
    genuine sequence of -2^63 must outrank a NULL-seq event for the
    same key (with the old coalesce sentinel the two collided and the
    winner was nondeterministic), and must itself lose to any higher
    sequence."""
    from alphavantage_etl_spark.operators.evolution import apply_changelog

    target = spark.createDataFrame([(1, 0.0)], "k long, v double")
    min_long = -(2**63)
    changes = spark.createDataFrame(
        [(1, -1.0, None, "U"), (1, 7.0, min_long, "U")],
        "k long, v double, seq long, op string",
    )
    out = apply_changelog(target, changes, ["k"], "seq", "op")
    assert {r["k"]: r["v"] for r in out.collect()} == {1: 7.0}
    # ...and a real higher seq still wins over MIN_LONG
    changes2 = spark.createDataFrame(
        [(1, 7.0, min_long, "U"), (1, 8.0, 0, "U")],
        "k long, v double, seq long, op string",
    )
    out2 = apply_changelog(target, changes2, ["k"], "seq", "op")
    assert {r["k"]: r["v"] for r in out2.collect()} == {1: 8.0}
