"""Cohort-retention and funnel semantics on crafted event frames."""

from __future__ import annotations

import datetime as dt

import pytest

from alphavantage_etl_spark.operators.cohorts import (
    cohort_retention,
    funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _t(day, hour=0):
    # January 2024: the 1st is a Monday, so week boundaries are day 1, 8, 15
    return dt.datetime(2024, 1, day, hour)


def test_cohort_offsets_and_distinct_users(spark):
    rows = [
        # u1 arrives week of Jan 1, active again weeks +1 and +2
        (1, _t(2), "view"), (1, _t(9), "view"), (1, _t(16), "view"),
        # u2 arrives week of Jan 1, twice in the same week (counted once)
        (2, _t(3), "view"), (2, _t(4), "view"),
        # u3 arrives week of Jan 8
        (3, _t(10), "view"),
    ]
    out = {
        (r["cohort_week"], r["week_offset"]): r["users"]
        for r in cohort_retention(_ev(spark, rows), "user_id", "ts").collect()
    }
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert out == {
        (w1, 0): 2,  # u1 + u2 (u2's two same-week events dedup)
        (w1, 1): 1,  # u1
        (w1, 2): 1,  # u1
        (w2, 0): 1,  # u3
    }


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes in order
        (1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "purchase"),
        # u2 purchases BEFORE clicking -> reaches click only
        (2, _t(1), "view"), (2, _t(3), "click"), (2, _t(2), "purchase"),
        # u3 never views -> reaches nothing (click alone does not count)
        (3, _t(2), "click"), (3, _t(3), "purchase"),
    ]
    out = {r["step_name"]: r["users"] for r in funnel_steps(
        _ev(spark, rows), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    ).collect()}
    assert out == {"view": 2, "click": 2, "purchase": 1}


def test_funnel_uses_earliest_qualifying_event(spark):
    # u1 has two clicks; the first (t2) qualifies, so the t3 purchase
    # counts even though it precedes the second click
    rows = [
        (1, _t(1), "view"), (1, _t(2), "click"),
        (1, _t(3), "purchase"), (1, _t(4), "click"),
    ]
    out = {r["step_name"]: r["users"] for r in funnel_steps(
        _ev(spark, rows), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    ).collect()}
    assert out["purchase"] == 1


def test_funnel_counts_monotone_on_fixture(spark):
    from alphavantage_etl_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    out = sorted(
        funnel_steps(
            ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect(),
        key=lambda r: r["step_idx"],
    )
    users = [r["users"] for r in out]
    assert users == sorted(users, reverse=True)
    assert users[0] > 0


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_steps(_ev(spark, []), "user_id", "ts", "event_type", [])


def test_transition_matrix_counts_and_rates(spark):
    from alphavantage_etl_spark.operators.cohorts import transition_matrix

    rows = [
        # u1: A -> B -> A ; u2: A -> B
        (1, _t(1), "A", 1), (1, _t(2), "B", 2), (1, _t(3), "A", 3),
        (2, _t(1), "A", 4), (2, _t(2), "B", 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in transition_matrix(
               df, "user_id", "ts", "event_type", "event_id"
           ).collect()}
    assert out == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_transition_matrix_never_crosses_keys(spark):
    from alphavantage_etl_spark.operators.cohorts import transition_matrix

    rows = [(1, _t(1), "A", 1), (2, _t(2), "B", 2)]  # different users
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    assert transition_matrix(
        df, "user_id", "ts", "event_type", "event_id"
    ).count() == 0


# -------------------------------------------------------- session paths
def test_session_paths_respect_boundaries(spark):
    from datetime import datetime

    from alphavantage_etl_spark.operators.sessionize import (
        top_session_paths,
        with_session_ids,
    )

    def t(minute):
        return datetime(2024, 1, 1, 10, minute)

    rows = [
        # user 1, session 0: a->b->c ; after a 2h gap, session 1: a->b->c
        (1, 1, "a", t(0)), (1, 2, "b", t(5)), (1, 3, "c", t(10)),
        (1, 4, "a", t(10).replace(hour=13)), (1, 5, "b", t(15).replace(hour=13)),
        (1, 6, "c", t(20).replace(hour=13)),
        # user 2, one session: a->b only (no trigram)
        (2, 7, "a", t(0)), (2, 8, "b", t(5)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    sids = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in with_session_ids(df, gap_seconds=1800).collect()
    }
    assert sids[(1, 1)] == 0 and sids[(1, 3)] == 0
    assert sids[(1, 4)] == 1  # 2h gap splits
    assert sids[(2, 7)] == 0

    out = top_session_paths(df, gap_seconds=1800, n=3, k=10).collect()
    by_path = {r["path"]: r for r in out}
    # the trigram never spans the session boundary: c>a>b must NOT appear
    assert "c>a>b" not in by_path
    assert by_path["a>b>c"]["occurrences"] == 2
    assert by_path["a>b>c"]["n_sessions"] == 2
    assert len(by_path) == 1  # user 2's pair is too short for a trigram


def test_session_paths_boundary_gap_is_inclusive(spark):
    from datetime import datetime

    from alphavantage_etl_spark.operators.sessionize import with_session_ids

    # an event EXACTLY gap after its predecessor merges (strict > split),
    # matching session_window's merge-inclusive boundary
    rows = [
        (1, 1, "a", datetime(2024, 1, 1, 10, 0, 0)),
        (1, 2, "b", datetime(2024, 1, 1, 10, 30, 0)),   # exactly 1800s
        (1, 3, "c", datetime(2024, 1, 1, 11, 0, 1)),    # 1801s after b
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    sids = {
        r["event_id"]: r["session_id"]
        for r in with_session_ids(df, gap_seconds=1800).collect()
    }
    assert sids[1] == 0 and sids[2] == 0 and sids[3] == 1


# --------------------------------------------------------- basket lift
def test_pair_lift_known_arithmetic(spark):
    from alphavantage_etl_spark.operators.baskets import pair_lift

    # 4 baskets; (x,y) together in 2; x in 3, y in 2; z alone
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = pair_lift(df, "b", "i", min_support=2, k=10).collect()
    assert len(out) == 1  # only (x,y) reaches support 2
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_pair"]) == ("x", "y", 2)
    assert abs(r["lift"] - (2 * 4) / (3 * 2)) < 1e-9


def test_pair_lift_presence_based_and_support_gate(spark):
    from alphavantage_etl_spark.operators.baskets import pair_lift

    # duplicate (basket, item) rows count once; a single co-occurrence
    # is gated out at min_support=2
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "d")]
    df = spark.createDataFrame(rows, "b long, i string")
    assert pair_lift(df, "b", "i", min_support=2, k=10).collect() == []
    one = pair_lift(df, "b", "i", min_support=1, k=10).collect()
    got = {(r["item_a"], r["item_b"]): r["n_pair"] for r in one}
    assert got == {("a", "b"): 1, ("c", "d"): 1}


def test_pair_lift_mega_basket_capped(spark):
    from alphavantage_etl_spark.operators.baskets import pair_lift

    mega = [(99, f"m{i}") for i in range(50)]
    normal = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(mega + normal, "b long, i string")
    out = pair_lift(df, "b", "i", min_support=2, k=10, max_basket=10).collect()
    # the 50-item basket is excluded BEFORE pairing; only (a,b) remains,
    # and N counts only surviving baskets
    assert len(out) == 1
    assert out[0]["item_a"] == "a" and abs(out[0]["lift"] - 1.0) < 1e-9


# ------------------------------------------------------- Kaplan-Meier
def test_kaplan_meier_textbook_curve_with_censoring_and_death(spark):
    from alphavantage_etl_spark.operators.survival import kaplan_meier

    # durations with mixed events/censoring; the last at-risk subject
    # events, driving survival to EXACTLY zero via the killed flag
    subj = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (5, 0), (6, 1)],
        "duration long, churned int",
    )
    out = {r["duration"]: r for r in kaplan_meier(
        subj, "duration", "churned").collect()}
    assert sorted(out) == [1, 2, 3, 6]  # event times only
    assert out[1]["n_at_risk"] == 6 and abs(out[1]["survival"] - 5 / 6) < 1e-8
    # censored-at-2 subject still in the risk set AT 2 (standard KM)
    assert out[2]["n_at_risk"] == 5 and out[2]["n_censored"] == 1
    assert abs(out[2]["survival"] - (5 / 6) * (4 / 5)) < 1e-8
    assert out[3]["n_at_risk"] == 3
    assert abs(out[3]["survival"] - (5 / 6) * (4 / 5) * (2 / 3)) < 1e-8
    # everyone at risk at 6 events: survival is exactly 0, not exp(-inf)
    assert out[6]["n_at_risk"] == 1 and out[6]["survival"] == 0.0


def test_kaplan_meier_all_censored_and_partition_invariant(spark):
    from alphavantage_etl_spark.operators.survival import kaplan_meier

    all_cens = spark.createDataFrame(
        [(i % 5, 0) for i in range(20)], "duration long, churned int"
    )
    assert kaplan_meier(all_cens, "duration", "churned").collect() == []

    subj = spark.createDataFrame(
        [(i % 7, i % 3 == 0) for i in range(60)],
        "duration long, churned boolean",
    ).selectExpr("duration", "CAST(churned AS INT) AS churned")
    a = sorted(kaplan_meier(subj, "duration", "churned").collect())
    b = sorted(
        kaplan_meier(subj.repartition(8), "duration", "churned").collect()
    )
    assert a == b


# ------------------------------------------------- conversion attribution
def test_attribution_first_last_linear_known_journeys(spark):
    """Hand-computed journeys: user 1 has touches a,b then purchase, then
    touch c then purchase; user 2 has touches but never converts (no
    attribution); user 3 converts with no prior touches (no rows)."""
    import datetime as dt

    from alphavantage_etl_spark.operators.cohorts import (
        conversion_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1, journey 1: a (first), b (last) -> purchase
        (1, ts(0), 10, "a"),
        (1, ts(1), 11, "b"),
        (1, ts(2), 12, "purchase"),
        # user 1, journey 2: c alone -> purchase
        (1, ts(3), 13, "c"),
        (1, ts(4), 14, "purchase"),
        # user 2: touches, never converts
        (2, ts(0), 20, "a"),
        (2, ts(1), 21, "b"),
        # user 3: purchase with no touches
        (3, ts(0), 30, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in conversion_attribution(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    # journey 1: a first, b last, linear 0.5 each; journey 2: c both, 1.0
    assert out["a"]["first_touch"] == 1 and out["a"]["last_touch"] == 0
    assert out["b"]["first_touch"] == 0 and out["b"]["last_touch"] == 1
    assert out["c"]["first_touch"] == 1 and out["c"]["last_touch"] == 1
    assert abs(out["a"]["linear_credit"] - 0.5) < 1e-9
    assert abs(out["b"]["linear_credit"] - 0.5) < 1e-9
    assert abs(out["c"]["linear_credit"] - 1.0) < 1e-9


def test_attribution_same_timestamp_tiebreaks_on_id(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.cohorts import (
        conversion_attribution,
    )

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, 2, "b"),          # same ts: id 2 > 1 -> last touch
        (1, t, 1, "a"),          # same ts: id 1 -> first touch
        (1, t, 3, "purchase"),   # same ts: id 3 closes the journey
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in conversion_attribution(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert out["a"]["first_touch"] == 1 and out["b"]["last_touch"] == 1


def test_markov_attribution_hand_chain(spark):
    """Two-channel chain with hand-checkable absorption: channel 'a'
    always leads to conversion, channel 'b' always to abandonment —
    removing 'a' must kill ALL conversion (removal_effect 1.0),
    removing 'b' must not reduce it (effect 0.0)."""
    import datetime as dt

    from alphavantage_etl_spark.operators.cohorts import markov_attribution

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = []
    eid = 0
    # 3 users: a -> purchase
    for u in range(3):
        rows += [(u, ts(0), (eid := eid + 1), "a"),
                 (u, ts(1), (eid := eid + 1), "purchase")]
    # 2 users: b -> (no conversion)
    for u in range(10, 12):
        rows.append((u, ts(0), (eid := eid + 1), "b"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in markov_attribution(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    # chain: start -> a (3/5) -> conv; start -> b (2/5) -> null
    assert out["a"]["base_p"] == pytest.approx(0.6, abs=1e-9)
    assert out["a"]["removal_effect"] == pytest.approx(1.0, abs=1e-9)
    assert out["b"]["removal_effect"] == pytest.approx(0.0, abs=1e-9)

    import pytest as _pt

    with _pt.raises(ValueError, match="iters"):
        markov_attribution(
            ev, "user_id", "ts", "event_type", "event_id", iters=0
        )


def test_active_users_window_arithmetic(spark):
    """Hand-checkable DAU/WAU/MAU: user 1 visits days 1 and 9, user 2
    visits day 1 only. WAU(day 7) still counts day-1 visitors; WAU(day
    8) no longer does; trailing days never extend past the corpus."""
    import datetime as dt

    from alphavantage_etl_spark.operators.cohorts import active_users

    def ts(day, h=12):
        return dt.datetime(2024, 1, day, h)

    ev = spark.createDataFrame(
        [(1, ts(1)), (2, ts(1)), (1, ts(1, 18)), (1, ts(9))],
        "user_id long, ts timestamp_ntz",
    )
    out = {r["day"].day: r for r in active_users(ev, "user_id", "ts").collect()}
    assert out[1]["dau"] == 2 and out[1]["wau"] == 2 and out[1]["mau"] == 2
    assert out[2]["dau"] == 0 and out[2]["wau"] == 2  # day-1 visitors linger
    assert out[7]["wau"] == 2 and out[8]["wau"] == 0  # 7-day horizon
    assert out[9]["dau"] == 1 and out[9]["wau"] == 1 and out[9]["mau"] == 2
    assert out[9]["stickiness"] == 0.5
    assert max(out) == 9  # never emits days past the last event
    assert len(out) == 9  # every day in range present (mau carries)

    import pytest as _pt

    with _pt.raises(ValueError, match="week"):
        active_users(ev, "user_id", "ts", week=9, month=7)


def test_conversion_latency_hand_values(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.cohorts import conversion_latency

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: a at 0s -> purchase at 100s (latency 100)
        (1, ts(0), 1, "a"), (1, ts(100), 2, "purchase"),
        # user 2: a at 0s, b at 10s -> purchase at 300s (first touch a, 300)
        (2, ts(0), 3, "a"), (2, ts(10), 4, "b"), (2, ts(300), 5, "purchase"),
        # user 3: b touches but never converts -> no row
        (3, ts(0), 6, "b"),
        # sub-second straddle: first touch at 0.9s, purchase at 1.0s ->
        # whole-second truncation gives 1, identically on both engines
        (4, ts(0) + dt.timedelta(milliseconds=900), 7, "c"),
        (4, ts(1), 8, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in conversion_latency(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert set(out) == {"a", "c"}
    assert out["a"]["n_conversions"] == 2
    assert out["a"]["p50_latency_s"] == 200.0  # interpolated between 100, 300
    assert out["c"]["p50_latency_s"] == 1.0


def test_retention_decay_recovers_planted_rate(spark):
    """Synthetic cohort with exact geometric retention 0.5^offset: the
    log-linear fit must recover slope = ln(0.5) exactly (every point is
    on the line) and intercept ~ 0."""
    import datetime as dt
    import math

    from alphavantage_etl_spark.operators.cohorts import retention_decay

    rows = []
    base = dt.datetime(2024, 1, 1, 12)  # a Monday
    # 8 users arrive week 0; 4 return week 1; 2 week 2; 1 week 3
    for u in range(8):
        rows.append((u, base))
    for u in range(4):
        rows.append((u, base + dt.timedelta(weeks=1)))
    for u in range(2):
        rows.append((u, base + dt.timedelta(weeks=2)))
    rows.append((0, base + dt.timedelta(weeks=3)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = retention_decay(ev, "user_id", "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 3  # offsets 1..3
    assert r["slope"] == pytest.approx(math.log(0.5), abs=1e-6)
    assert r["intercept"] == pytest.approx(0.0, abs=1e-6)
