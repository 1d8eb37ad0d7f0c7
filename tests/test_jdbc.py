"""S7 JDBC source: REAL roundtrip tests against the Derby embedded
driver that ships in Spark's own jars (no network database needed).

The reference stages trips in PostgreSQL before export (reference
README.md:296-304); `sources/jdbc.py` is the Spark-native replacement
surface.  These tests drive the full matrix: write, serial read,
stride-partitioned read (partition count lands in the scan), and
predicate-partitioned read, plus the fail-loud validation that stops a
"parallel" read from silently running on one connection.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_clickhouse_spark.sources.jdbc import read_jdbc, write_jdbc

URL = "jdbc:derby:memory:s7tests;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_table(spark):
    df = spark.range(100).selectExpr("id", "id * 3 AS v")
    write_jdbc(df, URL, "trips_staging", mode="overwrite", driver=DRIVER)
    return "trips_staging"


def test_serial_roundtrip(spark, jdbc_table):
    back = read_jdbc(spark, URL, jdbc_table, driver=DRIVER)
    rows = {(r[0], r[1]) for r in back.collect()}
    assert rows == {(i, 3 * i) for i in range(100)}


def test_stride_partitioned_read(spark, jdbc_table):
    back = read_jdbc(
        spark, URL, jdbc_table,
        partition_column="ID", lower_bound=0, upper_bound=100,
        num_partitions=4, driver=DRIVER,
    )
    # the stride request must materialize as REAL scan parallelism,
    # not a hint that degrades to one task
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert {r[0] for r in back.collect()} == set(range(100))


def test_predicate_partitioned_read(spark, jdbc_table):
    back = read_jdbc(
        spark, URL, jdbc_table,
        # raw WHERE fragments reach the database verbatim: Spark wrote
        # the table with quoted (lowercase) identifiers, so predicates
        # must quote them too (the stride path resolves case itself)
        predicates=['MOD("id", 2) = 0', 'MOD("id", 2) = 1'], driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == 100


def test_pushdown_subquery_table(spark, jdbc_table):
    back = read_jdbc(
        spark, URL,
        f'(SELECT "id" FROM {jdbc_table} WHERE "id" < 10) q',
        driver=DRIVER,
    )
    assert back.count() == 10
    assert back.columns == ["id"]


def test_parallel_without_bounds_raises(spark):
    with pytest.raises(ValueError, match="ONE connection"):
        read_jdbc(spark, URL, "t", num_partitions=8, driver=DRIVER)
    with pytest.raises(ValueError, match="cannot stride"):
        read_jdbc(
            spark, URL, "t", partition_column="ID", num_partitions=8,
            driver=DRIVER,
        )
    with pytest.raises(ValueError, match="not both"):
        read_jdbc(
            spark, URL, "t", partition_column="ID", lower_bound=0,
            upper_bound=1, num_partitions=2, predicates=["1=1"],
            driver=DRIVER,
        )
