"""Scan-width control for CPU-heavy per-row derivations.

A Spark stage's task count is fixed by its INPUT partitioning: work
fused into the scan stage (tokenization, shingling, hashing, explode
fan-outs) runs on however many partitions the file layout yields. A
small or single-file parquet input — one row group, so
``maxPartitionBytes`` cannot split it — pins ALL of that CPU to one
task regardless of cluster size.

``spread_scan`` inserts one bounded repartition of the PRE-derivation
rows when (and only when) the input is narrower than the cluster: the
shuffle moves the raw rows (cheap), the expensive derivation then runs
on every core. At 100 TB the scan already carries thousands of
partitions and this is a no-op — the guard exists so local/bench
behavior matches the cluster's natural parallelism, not to add a
shuffle at scale. Only correct for derivations whose downstream
results are partitioning-immune (exact-integer aggregation, hash
grouping — the engine-wide discipline here).

Measured (sf0.1, local[32], warm): q_bootstrap_ci 10.2 -> 1.5-2.2 s,
q_perm_test 10.5 -> 2.4 s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its
    current partitioning is narrower. Call on the smallest projection
    BEFORE a CPU-heavy per-row derivation or explode fan-out."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
