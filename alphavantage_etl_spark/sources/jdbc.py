"""JDBC source/sink — the reference's Postgres path (IO3/IO5).

The reference reads with literal SQL pushed to Postgres
(``pd.read_sql_query``, av_etl.py:161-185, data_viz.py:87-98) and appends
with ``df.to_sql(if_exists='append')`` (av_etl.py:30-38). Spark equivalents:

- **scan**: ``spark.read.jdbc`` with either ``dbtable`` (Catalyst pushes
  filters/projections into the generated query) or a ``query`` option for
  hand-written pushdown — the reference's LIMIT/ORDER BY pushdown
  (SURVEY.md section 4.1) comes free via ``pushDownLimit``.
- **parallel scan**: ``partitionColumn/lowerBound/upperBound/numPartitions``
  split the table into range predicates executed concurrently — the 100 TB
  posture for a big JDBC table (one connection per partition).
- **append**: ``df.write.jdbc(mode='append')``. The PK-idempotency contract
  (av_etl.py:37-38) stays anti-join-before-append (operators/incremental);
  JDBC DDL (primary keys) belongs to migrations, not the engine.

No database ships in this container, so these helpers only CONFIGURE
readers/writers (no connection is made until an action runs); tests cover
the configuration surface. ``load()``/``save()`` against a real URL is the
deployment path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrameReader:
    """Configured JDBC reader (call ``.load()`` against a live database).

    Exactly one of ``table``/``query``. Partitioned-scan knobs must come
    together; with them a 100 TB table reads as ``num_partitions``
    concurrent range scans instead of one connection.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    r = spark.read.format("jdbc").option("url", url)
    r = r.option("dbtable", table) if table else r.option("query", query)
    partition_knobs = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(k is not None for k in partition_knobs):
        if any(k is None for k in partition_knobs):
            raise ValueError(
                "partition_column, lower_bound, upper_bound, num_partitions "
                "must be provided together"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def jdbc_append(
    df: DataFrame, url: str, table: str, batchsize: int = 10_000, **options: str
):
    """Configured append writer (call ``.save()`` against a live database).
    Pair with ``operators.incremental.new_rows`` for idempotent appends —
    the engine-side replacement for the reference's PK constraint."""
    w = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in options.items():
        w = w.option(k, v)
    return w
