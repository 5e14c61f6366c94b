"""Storage layout strategies: partitioned and bucketed tables.

At 100 TB the difference between a usable table and an unusable one is
layout, not compute:

- **Partition by a coarse time/tenant column** (`partitionBy`): predicates
  on the partition column prune entire directories BEFORE any IO
  (`PartitionFilters` in the scan node). Daily-date partitioning of the
  reference's bar tables means an incremental run (`date > watermark`)
  touches only the new partitions — the physical form of the watermark
  protocol (SURVEY.md ST1).
- **Bucket by a high-cardinality join key** (`bucketBy` + `sortBy`): both
  sides of a recurring equi-join pre-hashed into the same bucket count
  join WITHOUT a shuffle (no Exchange in the plan) — the standing answer
  to "lineitem joins orders every night on orderkey".

Rules of thumb encoded here: partition count per write kept well under
10k (small-files death); bucket counts chosen as a power of two so two
bucketed tables can co-join after doubling one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Date/tenant-partitioned parquet layout; readers' filters on
    ``partition_col`` prune directories (verify via ``PartitionFilters``)."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table. Joining two tables
    bucketed on the same key with the same ``n_buckets`` needs no shuffle;
    sorted buckets additionally skip the in-memory sort of sort-merge."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table, format="parquet")


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucketing Catalyst
    plans a SortMergeJoin with ZERO Exchange operators — callers can assert
    ``"Exchange" not in plan`` as the co-location proof."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
