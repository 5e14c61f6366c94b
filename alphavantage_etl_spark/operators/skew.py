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

from pyspark.sql import Column, DataFrame
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


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for heavy groups: aggregate per (key, salt)
    shard first, then merge shards per key.

    ``aggs`` maps output column name -> a DECOMPOSABLE pair encoded as one
    Column for stage 1; stage 2 merges with the matching combiner. To keep
    the API honest (not every aggregate merges with the same function),
    only sum/count/min/max shapes are accepted — expressed as stage-1
    Columns; the combiner is inferred from the expression name.

    For algebraic aggregates Spark's partial aggregation already does this
    map-side; use salted_agg when the group count is small AND groups are
    huge (partials help less: few groups -> few map-side buckets) or
    downstream needs the (key, salt) sharding anyway.
    """
    salt_src = salt_cols or [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt))
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(f"__s1_{name}") for name, c in aggs.items()]
    )

    mergers = []
    for name, c in aggs.items():
        expr = c._jc.toString().lower()
        s1 = F.col(f"__s1_{name}")
        if expr.startswith("count("):
            mergers.append(F.sum(s1).alias(name))
        elif expr.startswith("sum("):
            mergers.append(F.sum(s1).alias(name))
        elif expr.startswith("min("):
            mergers.append(F.min(s1).alias(name))
        elif expr.startswith("max("):
            mergers.append(F.max(s1).alias(name))
        else:
            raise ValueError(
                f"aggregate {name}={expr!r} is not sum/count/min/max-shaped; "
                "compose avg as sum+count at the call site"
            )
    return stage1.groupBy(*keys).agg(*mergers)
