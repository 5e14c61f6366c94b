"""Sessionization (X6) — gap-based event sessions per user.

Batch implementation uses Spark's native ``session_window`` (the same
operator Structured Streaming uses for stateful session aggregation, so the
batch and streaming plans share semantics). A session groups a user's events
whose inter-event gap is < ``gap``; ``session_window.end`` is last-event +
gap, so the aggregated ``last_ts`` is taken from the events themselves.

Scale: one shuffle on the partition key (user_id); state per key is bounded
by the session merge, and the streaming variant bounds it further with a
watermark (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """One row per (user, session): start/last timestamps, event count, value sum.

    Boundary semantics (verified empirically, pinned in tests): an event
    exactly ``gap`` after its predecessor is MERGED into the same session —
    session_window's merge condition is inclusive. The islands/lag oracle
    formulation must therefore split only on ``diff > gap``, not ``>=``.
    """
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .drop("session_window")
    )


def with_session_ids(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append ``session_id`` (0-based per user) to EVENT rows — the
    row-level companion of `sessionize` (which aggregates): islands/lag
    formulation, split when the inter-event gap EXCEEDS ``gap_seconds``
    (strict >, matching session_window's merge-inclusive boundary,
    pinned by the sessionize tests). The boundary compares timestamps
    with interval arithmetic — integer-exact on any engine and free of
    session-timezone/DST dependence (no epoch conversion). One window
    Exchange on the user key; the running boundary sum rides the same
    sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    # interval comparison directly on the timestamp values — works for
    # TIMESTAMP and TIMESTAMP_NTZ alike (the fixture loader yields NTZ;
    # unix_micros would reject it, and an NTZ->LTZ cast would make the
    # boundary depend on the session timezone across DST transitions)
    prev = F.lag(F.col(ts_col)).over(w)
    # two projections: a window aggregate cannot consume another window
    # expression in the same select — but both ride ONE Exchange+sort
    # (identical partitioning/ordering, Catalyst fuses the Window nodes)
    boundary = F.when(
        prev.isNull()
        | (
            F.col(ts_col)
            > prev + F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
        ),
        1,
    ).otherwise(0)
    return (
        df.withColumn("__b", boundary)
        .withColumn(
            "session_id",
            (
                F.sum("__b").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                - 1
            ).cast("long"),
        )
        .drop("__b")
    )


def top_session_paths(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """(path, occurrences, n_sessions) — the k most frequent ordered
    event-type n-grams WITHIN sessions (the "what do users actually do"
    path-mining readout; a path never spans a session boundary). ``path``
    joins types with '>'; ``occurrences`` counts every window position,
    ``n_sessions`` the distinct sessions containing the path at least
    once.

    Scale design (100 TB): session ids are one user-key window; the
    n-gram window partitions on (user, session) — a refinement, so one
    more Exchange; each event emits at most ONE n-gram start (no
    combinatorial blowup); the path aggregation is vocabulary-bounded
    (|event types|^n keys worst case) with map-side combine; top-k is
    TakeOrderedAndProject under a total (count, path) order.
    """
    from pyspark.sql import Window

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    sess = with_session_ids(df, ts_col, key_col, id_col, gap_seconds)
    w2 = Window.partitionBy(key_col, "session_id").orderBy(ts_col, id_col)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w2) for i in range(1, n)
    ]
    full = parts[-1].isNotNull()
    grams = sess.select(
        F.col(key_col),
        F.col("session_id"),
        F.when(full, F.concat_ws(">", *parts)).alias("path"),
    ).where(F.col("path").isNotNull())
    return (
        grams.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct(key_col, "session_id").alias("n_sessions"),
        )
        .orderBy(F.desc("occurrences"), "path")
        .limit(k)
    )

def skipgram_sequences(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    max_gap: int = 3,
    min_support: int = 2,
) -> DataFrame:
    """(antecedent, consequent, support, n_antecedent, confidence):
    frequent ORDERED event-type pairs where the consequent follows the
    antecedent within ``max_gap`` steps of the same user's timeline —
    the PrefixSpan-lite sequence miner beside the adjacent-only
    collocations (X41) and full-path table (X42): "signup is followed
    by purchase within 3 actions" is a skip-gram, invisible to both.

    support = # users exhibiting the pair (distinct, so a single hyper-
    active user cannot fabricate a "frequent" pattern); confidence =
    support / #users with the antecedent at all. Exact int ratio,
    unrounded. Events order by (ts, event type) per user — total and
    deterministic under timestamp ties; rows with a NULL timestamp are
    EXCLUDED (they have no position on a timeline, and engines disagree
    on NULL sort placement — Spark first, ANSI-default last).

    Scale: positions come from a per-USER window (bounded by per-user
    depth, the sessionize class); the pair self-join is user-keyed with
    the gap predicate bounding fan-out to depth x max_gap per user;
    distinct-user support is one aggregation over the pair table.
    """
    if max_gap < 1:
        raise ValueError(f"max_gap must be >= 1, got {max_gap}")
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("ts", "t")
    pos = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("t"),
        )
        .where(F.col("ts").isNotNull())
        .withColumn("i", F.row_number().over(w))
    )
    a = pos.select("u", F.col("t").alias("antecedent"), F.col("i").alias("ia"))
    b = pos.select("u", F.col("t").alias("consequent"), F.col("i").alias("ib"))
    pairs = a.join(b, "u").where(
        (F.col("ib") > F.col("ia"))
        & (F.col("ib") <= F.col("ia") + max_gap)
    )
    sup = pairs.groupBy("antecedent", "consequent").agg(
        F.count_distinct("u").alias("support")
    )
    ante = pos.groupBy(F.col("t").alias("antecedent")).agg(
        F.count_distinct("u").alias("n_antecedent")
    )
    return (
        sup.where(F.col("support") >= min_support)
        .join(ante, "antecedent")
        .select(
            "antecedent",
            "consequent",
            "support",
            "n_antecedent",
            (
                F.col("support").cast("double")
                / F.col("n_antecedent").cast("double")
            ).alias("confidence"),
        )
    )


def burstiness(
    events: DataFrame,
    group_col: str,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(group, n_gaps, mean_gap_s, burstiness): the Goh-Barabasi
    burstiness coefficient ``B = (sigma - mu) / (sigma + mu)`` of the
    inter-arrival gaps within each group's user timelines — "is this
    traffic a steady drumbeat (B -> -1), Poisson (B ~ 0), or bursty
    sessions (B -> 1)" — the arrival-process profile that sessionize
    thresholds and capacity planning read.

    Gaps are whole SECONDS between consecutive events of the same
    (group, user), ordered by (ts, tiebreak) — SECOND-boundary
    crossings (both stamps truncate to the second first: the ANSI
    date_diff convention; an untruncated floor-of-interval diff
    disagrees with it on sub-second timestamps), integer-exact via
    timestampdiff (INTERVAL arithmetic: no epoch conversion, no
    session-timezone dependence). Moments accumulate in decimal(38,0);
    mean_gap_s is an exact int ratio (unrounded), B is the one
    transcendental output (sigma), half-even-rounded to 1e-9. Groups
    with no gaps or sigma + mu = 0 yield NULL B.

    Scale: one lag window partitioned by (group, user) — per-user-
    timeline partitions, the sessionize class — then one hash
    aggregation per group. No corpus-sized partitions, no self-joins.
    """
    base = events.select(
        F.col(group_col).alias("g"),
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
    ).where(F.col("ts").isNotNull())
    gaps = base.select(
        "g",
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', lag(ts) over "
            "(partition by g, u order by ts, tb)), "
            "date_trunc('second', ts))"
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = gaps.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(dec(F.col("gap"))).alias("__s1"),
        F.sum(dec(F.col("gap")) * dec(F.col("gap"))).alias("__s2"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("__s1").cast("double") / n
    var = F.col("__s2").cast("double") / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        F.col("g").alias(group_col),
        "n_gaps",
        mu.alias("mean_gap_s"),
        F.when(
            sigma + mu > 0, F.bround((sigma - mu) / (sigma + mu), 9)
        ).alias("burstiness"),
    )
