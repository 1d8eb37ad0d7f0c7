"""Catalog introspection (SURVEY §2.1 S8, §2.4 A7).

The reference monitors ingest progress with ``pg_stat_user_tables`` /
``pg_class ⋈ pg_namespace`` row-count queries (README.md:240, 271-278).
Spark's catalog API replaces the system-table joins; exact counts come
from the tables themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_row_counts(
    spark: SparkSession, exclude_prefixes: tuple[str, ...] = ()
) -> DataFrame:
    """Row counts for every catalog table, largest first — the
    ``relname / to_char(reltuples)`` report of README.md:271-278
    (P4's NOT-IN namespace filter becomes the prefix exclusion)."""
    names = [
        t.name
        for t in spark.catalog.listTables()
        if not any(t.name.startswith(p) for p in exclude_prefixes)
    ]
    rows = [(n, spark.table(n).count()) for n in names]
    return spark.createDataFrame(rows or [("", 0)], "table_name string, row_count long") \
        .filter("table_name != ''") \
        .orderBy("row_count", ascending=False)


def describe(spark: SparkSession, table: str) -> DataFrame:
    """``DESCRIBE EXTENDED`` passthrough (schema introspection)."""
    return spark.sql(f"DESCRIBE EXTENDED {table}")
