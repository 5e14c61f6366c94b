"""alphavantage_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL (KamilPiet/alphavantage-etl),
re-expressed Spark-first per SURVEY.md.

Layout
------
- ``session``    SparkSession builder with scale-sane defaults (AQE, UTC, Arrow).
- ``sources``    Parquet fixture loaders with declared schemas; Alpha-Vantage-wire
                 JSON ingest (map-of-maps -> rows); JDBC source/sink (gated).
- ``functions``  Column-level building blocks: money rounding (half-even), SMA
                 window with the reference's NULL-under-k semantics, business-day
                 calendar, vector similarity, text analysis. All UDF-free.
- ``operators``  Composable dataflow operators: OHLCV bars, incremental
                 (watermark / anti-join) merge, as-of join, dedup (exact +
                 MinHash-LSH), top-k similarity search, sessionization.
- ``plans``      Reference-shaped derived views (``src_px_usd`` / ``src_usd_fx``
                 / ``prd_px_fx``) and the flagship end-to-end query.
- ``streaming``  Structured Streaming variants of the incremental pipeline.

Every operator is built from native ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen-friendly); no row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.1.0"
