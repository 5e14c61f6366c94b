"""Skew mitigation: salted joins and two-stage aggregation.

At 100 TB a handful of heavy-hitter keys (the null user, the default
symbol, organic hot entities) can pin a shuffle partition to one executor
for hours. First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it splits
oversized SHUFFLE partitions at runtime. Salting complements it where AQE
cannot help: broadcast-ineligible joins whose skew is in the BUILD of a
single key's hash bucket, and aggregations with heavy groups under
non-algebraic aggregates (collect_list and friends) where partial
aggregation cannot compress map-side.

Both operators are pure DataFrame transforms with deterministic salt
assignment (hash of stable columns mod N, never rand() — reruns and
retried tasks must salt identically or results are nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    left_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``on``: spread each left key
    over ``salt`` sub-keys, replicate each right row to all sub-keys.

    Left rows get a deterministic salt from ``left_salt_cols`` (default:
    all non-key columns) so each hot key's rows split into ~salt equal
    shards; the right side is exploded salt-fold (appropriate when right is
    the smaller, still-too-big-to-broadcast side). The join result is
    row-identical to the unsalted join — salting only changes partitioning.
    """
    salt_src = left_salt_cols or [c for c in left.columns if c != on]
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


# op -> (stage-1 aggregate, stage-2 shard combiner). count's shards merge
# by SUM — the one case where the combiner differs from the stage-1 op,
# and the reason the op must be declared, not inferred.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for heavy groups: aggregate per (key, salt)
    shard first, then merge shards per key.

    ``aggs`` maps output column name -> ``(op, column)`` where ``op`` is
    one of ``sum | count | min | max`` — the decomposable shapes whose
    shard results merge exactly. The op is declared explicitly (never
    inferred from the expression string: that required the private
    ``Column._jc`` py4j handle, which is version-fragile and absent under
    Spark Connect). Compose avg as sum+count at the call site.

    For algebraic aggregates Spark's partial aggregation already does this
    map-side; use salted_agg when the group count is small AND groups are
    huge (partials help less: few groups -> few map-side buckets) or
    downstream needs the (key, salt) sharding anyway.
    """
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2) or spec[0] not in _MERGEABLE:
            raise ValueError(
                f"aggregate {name}={spec!r} must be ('sum'|'count'|'min'|'max', "
                "Column); compose avg as sum+count at the call site"
            )
    salt_src = salt_cols or [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt))
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _MERGEABLE[op][0](col).alias(f"__s1_{name}")
            for name, (op, col) in aggs.items()
        ]
    )
    mergers = [
        _MERGEABLE[op][1](F.col(f"__s1_{name}")).alias(name)
        for name, (op, _) in aggs.items()
    ]
    return stage1.groupBy(*keys).agg(*mergers)


def key_skew_stats(df: DataFrame, key_col: str) -> DataFrame:
    """One row (key_col, n_rows, n_keys, max_freq, p50_freq, p99_freq,
    avg_freq, skew_ratio): the pre-join skew profile of a key column —
    the number the 100 TB engineer reads BEFORE shuffling on a key
    (``skew_ratio`` = max/avg partition-weight imbalance; a ratio in the
    hundreds means salt this join or let AQE split it, and the p99/p50
    gap says whether the heat is one pathological key or a fat tail).

    Exact percentiles WITHOUT a data-sized window: per-key frequencies
    aggregate once, then collapse into the frequency-OF-frequency grid
    (one row per distinct frequency VALUE — bounded by the heaviest
    key's count in the worst case, typically tiny); the p50/p99 keys-
    by-frequency positions come from a cumulative window over that
    grid. avg_freq and skew_ratio are exact-int double ratios, shipped
    unrounded (pure rational).
    """
    freq = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("f"))
    )
    fof = freq.groupBy("f").agg(F.count(F.lit(1)).alias("nk"))
    w = Window.orderBy("f").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = fof.select(
        "f", "nk", F.sum("nk").over(w).alias("ck")
    )
    tot = fof.agg(
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("nk")).alias("nr"),
        F.sum("nk").alias("nkeys"),
        F.max("f").alias("maxf"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    pick = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("ck") >= F.ceil(F.col("nkeys") * F.lit(p)), F.col("f")
        )
    )
    out = j.groupBy().agg(
        F.first("nr").cast("long").alias("n_rows"),
        F.first("nkeys").alias("n_keys"),
        F.first("maxf").alias("max_freq"),
        pick(0.5).alias("p50_freq"),
        pick(0.99).alias("p99_freq"),
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return out.select(
        F.lit(key_col).alias("key_col"),
        "n_rows",
        "n_keys",
        "max_freq",
        "p50_freq",
        "p99_freq",
        avg.alias("avg_freq"),
        (F.col("max_freq").cast("double") / avg).alias("skew_ratio"),
    )


def hot_keys(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """(key, freq, share): the ``top_k`` heaviest values of a join/agg
    key with their row share — the concrete salting targets
    key_skew_stats' ratio points at. orderBy+limit lowers to
    TakeOrderedAndProject (per-partition top-k then a k-sized merge —
    never a global sort); ties break on the key value for determinism.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    freq = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    tot = freq.agg(
        F.sum(F.col("freq").cast("decimal(38,0)")).alias("nr")
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("freq"), F.col("key"))
        .limit(top_k)
        .select(
            "key",
            "freq",
            (
                F.col("freq").cast("double") / F.col("nr").cast("double")
            ).alias("share"),
        )
    )
