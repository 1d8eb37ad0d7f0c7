"""The reference's 4-query benchmark suite, DataFrame and SQL forms
(SURVEY §2.4 A1-A5, §2.6 O1).

Queries are verbatim re-expressions of src/benchmark_clickhouse.sh:3-14
against the curated trips table.  Each has a DataFrame form (hot path,
no SQL parse) and a SQL form (``spark.sql`` parity, tested equal).

All four are 1-3 key hash aggregations over a columnar scan — Catalyst
plans them as partial HashAggregate -> shuffle on the grouping keys ->
final HashAggregate, with AQE coalescing the tiny post-shuffle
partitions.  Group cardinality is ≤ a few thousand, so the shuffle is
negligible at any scale; the scan dominates, which is exactly the
reference's performance model (SURVEY §4 X7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q1(trips: DataFrame) -> DataFrame:
    """Q1: SELECT cab_type, count(*) FROM trips GROUP BY cab_type
    (src/benchmark_clickhouse.sh:4)."""
    return trips.groupBy("cab_type").agg(F.count("*").alias("cnt"))


def q2(trips: DataFrame) -> DataFrame:
    """Q2: SELECT passenger_count, avg(total_amount) ... GROUP BY 1
    (src/benchmark_clickhouse.sh:5)."""
    return trips.groupBy("passenger_count").agg(
        F.avg("total_amount").alias("avg_total_amount")
    )


def q3(trips: DataFrame) -> DataFrame:
    """Q3: count by (passenger_count, toYear(pickup_date))
    (src/benchmark_clickhouse.sh:6-8)."""
    return trips.groupBy(
        "passenger_count", F.year("pickup_date").alias("year")
    ).agg(F.count("*").alias("cnt"))


def q4(trips: DataFrame) -> DataFrame:
    """Q4: count by (passenger_count, year, round(trip_distance)),
    ORDER BY year, count(*) DESC (src/benchmark_clickhouse.sh:9-13)."""
    return (
        trips.groupBy(
            "passenger_count",
            F.year("pickup_date").alias("year"),
            F.round("trip_distance", 0).alias("distance"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("year").asc(), F.col("cnt").desc())
    )


def total_count(trips: DataFrame) -> DataFrame:
    """A5: SELECT count(*) (attach verification, README.md:902)."""
    return trips.agg(F.count("*").alias("cnt"))


#: spark.sql parity forms (same semantics; tested equal to the
#: DataFrame forms against the fixture corpus).
SQL_FORMS: dict[str, str] = {
    "q1": "SELECT cab_type, count(*) AS cnt FROM {t} GROUP BY cab_type",
    "q2": (
        "SELECT passenger_count, avg(total_amount) AS avg_total_amount "
        "FROM {t} GROUP BY passenger_count"
    ),
    "q3": (
        "SELECT passenger_count, year(pickup_date) AS year, count(*) AS cnt "
        "FROM {t} GROUP BY passenger_count, year"
    ),
    "q4": (
        "SELECT passenger_count, year(pickup_date) AS year, "
        "round(trip_distance, 0) AS distance, count(*) AS cnt "
        "FROM {t} GROUP BY passenger_count, year, distance "
        "ORDER BY year, cnt DESC"
    ),
    "total_count": "SELECT count(*) AS cnt FROM {t}",
}
