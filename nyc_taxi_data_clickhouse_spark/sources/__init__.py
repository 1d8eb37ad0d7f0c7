"""Sources & sinks (SURVEY §2.1 S1-S8)."""

from nyc_taxi_data_clickhouse_spark.sources.csv import (
    read_trips_csv,
    write_csv_shards,
)
from nyc_taxi_data_clickhouse_spark.sources.parquet import (
    attach_gold,
    write_bronze,
    write_gold,
)
from nyc_taxi_data_clickhouse_spark.sources.catalog import table_row_counts

__all__ = [
    "read_trips_csv",
    "write_csv_shards",
    "write_bronze",
    "write_gold",
    "attach_gold",
    "table_row_counts",
]
