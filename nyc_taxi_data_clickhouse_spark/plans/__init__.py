"""Logical plans: curation transform, denormalizing joins, benchmark
queries (SURVEY §2.2-2.6, §3)."""

from nyc_taxi_data_clickhouse_spark.plans.transform import curate_trips
from nyc_taxi_data_clickhouse_spark.plans.joins import join_dims

__all__ = ["curate_trips", "join_dims"]
