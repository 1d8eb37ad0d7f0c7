"""Catalog introspection (SURVEY §2.1 S8, §2.4 A7, §2.3 F14).

The reference monitors ingest progress with ``pg_stat_user_tables`` /
``pg_class ⋈ pg_namespace`` row-count queries (README.md:240, 271-278).
Spark's catalog API replaces the system-table joins; counts default to
exact ``count()`` scans (always fresh), with opt-in ``use_stats=True``
answering from catalog statistics when present (metadata-only, the
analog of ``pg_class.reltuples`` — may lag reality until re-ANALYZE).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ROWCOUNT_RE = re.compile(r"(\d+)\s+rows")


def _stats_row_count(spark: SparkSession, table: str) -> int | None:
    """Row count from catalog statistics (``DESCRIBE EXTENDED`` →
    Statistics "N bytes, M rows"), or None when no ANALYZE has run.
    Metadata-only — at 100 TB this is the difference between a catalog
    lookup and a full scan per table."""
    try:
        stats = (
            spark.sql(f"DESCRIBE EXTENDED {table}")
            .filter(F.col("col_name") == "Statistics")
            .collect()
        )
    except Exception:
        # temp views and path-based relations have no DESCRIBE EXTENDED
        # statistics section
        return None
    if not stats:
        return None
    m = _ROWCOUNT_RE.search(stats[0]["data_type"])
    return int(m.group(1)) if m else None


def analyze_tables(spark: SparkSession, tables: list[str]) -> None:
    """``ANALYZE TABLE ... COMPUTE STATISTICS`` for each table, making
    subsequent ``table_row_counts`` metadata-only (reference analog:
    autovacuum keeping ``reltuples`` fresh)."""
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")


def table_row_counts(
    spark: SparkSession,
    exclude_prefixes: tuple[str, ...] = (),
    use_stats: bool = False,
) -> DataFrame:
    """Row counts for every catalog table, largest first — the
    ``relname / to_char(reltuples)`` report of README.md:271-278
    (P4's NOT-IN namespace filter becomes the prefix exclusion).

    Default is exact ``count()`` scans.  With ``use_stats=True``,
    tables that carry catalog statistics (after ``analyze_tables``)
    are answered from metadata like the reference's ``reltuples`` —
    but unlike Postgres there is no autovacuum analog: Spark does NOT
    refresh statistics after inserts/appends, so the stats path
    reports counts as of the last ``analyze_tables`` call.  Callers
    opting in must re-analyze after mutations (the monitoring-loop
    pattern: ANALYZE after each ingest batch, then metadata-only
    reads between batches).
    """
    names = [
        t.name
        for t in spark.catalog.listTables()
        if not any(t.name.startswith(p) for p in exclude_prefixes)
    ]
    rows = []
    for n in names:
        cnt = _stats_row_count(spark, n) if use_stats else None
        rows.append((n, cnt if cnt is not None else spark.table(n).count()))
    return spark.createDataFrame(rows or [("", 0)], "table_name string, row_count long") \
        .filter("table_name != ''") \
        .orderBy("row_count", ascending=False)


def table_row_counts_pretty(
    spark: SparkSession,
    exclude_prefixes: tuple[str, ...] = (),
    width: int = 16,
) -> DataFrame:
    """F14: the reference's formatted monitoring report —
    ``to_char(reltuples, '999,999,999,999')`` right-aligned with
    ``lpad`` (README.md:272) — as a thousands-grouped, lpad-aligned
    string column next to the raw count."""
    counts = table_row_counts(spark, exclude_prefixes)
    return counts.select(
        "table_name",
        "row_count",
        F.lpad(F.format_number(F.col("row_count"), 0), width, " ").alias(
            "row_count_pretty"
        ),
    )


def describe(spark: SparkSession, table: str) -> DataFrame:
    """``DESCRIBE EXTENDED`` passthrough (schema introspection)."""
    return spark.sql(f"DESCRIBE EXTENDED {table}")
