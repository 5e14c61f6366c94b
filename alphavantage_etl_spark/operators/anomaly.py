"""Rolling z-score anomaly detection over an event stream.

Reference scope: the reference plots its series for eyeballing
(data_viz.py); the production counterpart is automated outlier flagging —
"this event's value is k sigmas from this user's recent behavior".

Scale design (100 TB): one window pass partitioned by the entity key —
a single Exchange, per-key state is the trailing ``lookback`` rows, no
UDF. The z-test is evaluated in EXACT integer arithmetic: values are
quantized to integer ticks (the fixture's 2-decimal values are exact at
scale 100), the rolling first and second moments are integer sums, and
|z| > z_thresh is tested as

    (n-1) * (n*x - s1)^2  >  z^2 * n * (n*s2 - s1^2)

which is the same inequality with every division cleared — no float
summation order, no sqrt, bit-identical across engines and partial-agg
merge orders (the same quantize-first discipline as sma_exact_cents).
Overflow headroom: with ticks < 2^16 and lookback <= 64 the left side is
< 2^51 — comfortably inside long arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def flag_anomalies(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lookback: int = 20,
    min_history: int = 8,
    z_thresh: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Flag events whose value deviates more than ``z_thresh`` sample
    standard deviations from the mean of the preceding ``lookback``
    events of the same key (the current row is excluded from its own
    baseline). Rows with fewer than ``min_history`` preceding events are
    not scored. Returns only the flagged rows, with the baseline size.
    """
    q = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-lookback, -1)
    )
    scored = (
        events.withColumn("_q", q)
        .withColumn("_n", F.count("_q").over(w))
        .withColumn("_s1", F.sum("_q").over(w))
        .withColumn("_s2", F.sum(F.col("_q") * F.col("_q")).over(w))
    )
    n, s1, s2, x = (F.col(c) for c in ("_n", "_s1", "_s2", "_q"))
    num = (n - 1) * (n * x - s1) * (n * x - s1)
    den = F.lit(z_thresh * z_thresh) * n * (n * s2 - s1 * s1)
    return (
        scored.filter((n >= min_history) & (num > den))
        .select(
            order_tiebreak,
            key_col,
            ts_col,
            value_col,
            n.cast("long").alias("baseline_n"),
        )
    )
