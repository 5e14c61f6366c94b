"""Kaplan-Meier survival estimation — time-to-event analysis with
right-censoring: the churn/retention curve ("what fraction of users are
still active after t days?") computed correctly when many subjects
haven't churned YET. Naive retention (fraction active at t among all
ever seen) is biased by exactly those censored subjects; KM is the
standard estimator that isn't.

Reference scope: none in the reference ETL; extends the event-analytics
family (X26 cohorts/funnel) with the survival readout.

Model: subjects ordered by observed duration; at each distinct EVENT
time t, ``n_t`` = subjects still at risk (duration >= t), ``d_t`` =
events at t; ``S(t) = prod over event times u <= t of (1 - d_u/n_u)``.
Censored subjects leave the risk set at their censoring time without
contributing an event — exactly the "still-active user" semantics.

Determinism discipline: the cumulative product computes as
``exp(cumsum(ln(1 - d/n)))`` with each factor's log half-even-quantized
to 1e-12 BEFORE the cumulative sum (one transcendental per DISTINCT
event time — the lm/PMI discipline), the sum exact in decimal(38,0),
and one exp + 1e-9 round at the end. A zero factor (everyone at risk
events at once) cannot enter ln: a cumulative flag forces survival to
EXACTLY 0 from that time on.

Scale design (100 TB): per-subject reduction is one hash agg; the
duration grid is DAY-QUANTIZED, so the ordered-cumulative window runs
over a table bounded by the observation span in days (thousands of
rows, not subjects) — the single-partition window is over BOUNDED model
state, the centroid-table class, never the subject population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_Q = 12


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """(duration, n_at_risk, n_events, n_censored, survival) — one row
    per distinct EVENT time (the KM step points), ascending.
    ``duration_col``: non-negative integer time units (quantize upstream
    — days, not micros, so the grid stays bounded); ``event_col``: 1 =
    event observed, 0 = right-censored at that duration."""
    grid = (
        subjects.select(
            F.col(duration_col).alias("duration"),
            F.col(event_col).cast("int").alias("__e"),
        )
        .groupBy("duration")
        .agg(
            F.sum("__e").alias("n_events"),
            F.sum(1 - F.col("__e")).alias("n_censored"),
            F.count(F.lit(1)).alias("__c"),
        )
    )
    # r15 optimization (guide §2.4 — remove passes): n_at_risk used to be
    # total - prefix_sum(__c), paying a separate global aggregate plus a
    # broadcast crossJoin (two extra AQE stage jobs per run). The same
    # exact long arithmetic is the SUFFIX sum of __c over the identical
    # ordering — one more frame on the Window node the cumulative pass
    # already needs, so the grid is windowed once and the total/crossJoin
    # jobs disappear. The grid stays day-bounded model state, so the
    # single-partition frame is unchanged in scale class.
    wf = Window.orderBy("duration").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    wc = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = grid.withColumn("n_at_risk", F.sum("__c").over(wf))
    # factor = 1 - d/n as an exact rational test: factor == 0 iff d == n
    dead = F.col("n_events") == F.col("n_at_risk")
    q_ln = F.when(
        (F.col("n_events") > 0) & ~dead,
        F.round(
            F.bround(
                F.log(
                    F.lit(1.0)
                    - F.col("n_events").cast("double")
                    / F.col("n_at_risk").cast("double")
                ),
                _Q,
            )
            * F.lit(10.0**_Q)
        ).cast("decimal(38,0)"),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    killed = F.max(dead.cast("int")).over(wc)  # sticky once any factor is 0
    out = (
        at_risk.withColumn("__qln", q_ln)
        .withColumn("__cum", F.sum("__qln").over(wc))
        .withColumn("__dead", killed)
        .where(F.col("n_events") > 0)
        .select(
            "duration",
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_censored").cast("long").alias("n_censored"),
            F.when(F.col("__dead") == 1, F.lit(0.0))
            .otherwise(
                F.bround(
                    F.exp(F.col("__cum").cast("double") / F.lit(10.0**_Q)), 9
                )
            )
            .alias("survival"),
        )
    )
    return out
