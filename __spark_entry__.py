"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``alphavantage_etl_spark`` (SURVEY.md section 2
operator inventory; queries + oracles in alphavantage_etl_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # events.parquet stores INT64 TIMESTAMP(NANOS); Spark needs this legacy
    # conf to read it (as long), which sources/parquet.py converts to
    # microsecond TIMESTAMP_NTZ. Runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_conf(spark)
    from alphavantage_etl_spark.plans import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from alphavantage_etl_spark.queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every declared query is
    oracle-backed (rows-only diagnostics live in EXTRA_QUERIES, outside the
    driver contract, and are exercised by bench.py + pytest instead)."""
    from alphavantage_etl_spark.queries import ORACLES

    return dict(ORACLES)
