"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference project ``srini-x/nyc-taxi-data-clickhouse``.

The reference (see /root/reference/README.md) is an ETL + OLAP pipeline:
ingest messy CSV, denormalize via left joins, apply a typed 45-column
cleanup transform, persist a partitioned/sort-clustered columnar table,
and answer four aggregation benchmark queries fast.  This package
re-expresses every one of those capabilities Spark-first (DataFrame /
Spark SQL / Catalyst / Parquet), and extends the surface with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    SparkSession factory tuned for columnar OLAP (AQE etc.)
- ``schema``     explicit StructType DDLs (staging + curated trips, dims)
- ``sources``    readers/sinks: CSV (null-normalizing), Parquet bronze/gold,
                 catalog introspection  (SURVEY §2.1 S1–S8)
- ``functions``  scalar expression library (SURVEY §2.8 F1–F15)
- ``plans``      curation transform, denormalizing joins, benchmark queries
                 (SURVEY §2.2–2.6)
- ``operators``  extension operators: dedup, similarity, text analysis,
                 multimodal  (SURVEY §7)
- ``streaming``  Structured Streaming pipelines over the events table
"""

from nyc_taxi_data_clickhouse_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
