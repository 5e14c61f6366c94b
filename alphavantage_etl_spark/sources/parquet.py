"""Parquet fixture source (FIXTURES.md section A).

The reference's sources are a REST/JSON API and Postgres-over-SQLAlchemy
(av_etl.py:22-27, 161-185); the driver fixtures are Parquet. This module is
the one place table schemas are declared (fail-fast, SURVEY.md section 1.3 —
the reference infers everything at load, which silently propagates type
drift; we do not).

Scale note: a plain ``spark.read.parquet`` keeps predicate pushdown, column
pruning, and partition pruning intact — never ``.cache()`` or collect here.
The loaders return lazy DataFrames; Catalyst prunes columns the query doesn't
touch (check ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Canonical post-load schemas (what ``load`` guarantees), matching the Parquet
# footers at /root/testdata (FIXTURES.md) with one normalization: events.ts is
# stored as INT64 TIMESTAMP(NANOS), which Spark's TimestampType (microsecond)
# cannot represent; ``load`` truncates ns -> us with integer division —
# identical to DuckDB's CAST(ts AS TIMESTAMP) so both engines see equal values.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a lazy DataFrame with the canonical schema.

    ``events.ts`` needs ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
    session.py): the raw column arrives as nanos-since-epoch LongType and is
    converted here via integer division (``div`` — floor for the post-1970
    fixture domain), matching DuckDB's ns->us truncation bit-for-bit.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast(T.TimestampNTZType()))
        df = df.select(*[f.name for f in SCHEMAS[name].fields])
    # The driver REGENERATES fixtures between rounds and physical types
    # drift (r3: events.ts TIMESTAMP(NANOS) -> MICROS). Normalize any
    # remaining column whose read type differs from the canonical schema
    # with an explicit cast — a no-op projection when types already match.
    # (The nanos-long case above must stay special: casting a raw long to
    # timestamp would interpret it as SECONDS.)
    dtypes = dict(df.dtypes)
    fixes = [
        f
        for f in SCHEMAS[name].fields
        if f.name in dtypes and dtypes[f.name] != f.dataType.simpleString()
    ]
    for f in fixes:
        df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
