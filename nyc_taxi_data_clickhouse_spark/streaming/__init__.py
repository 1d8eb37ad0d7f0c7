"""Structured Streaming pipelines (SURVEY §2.9 — extension scope; the
reference is pure batch)."""

from nyc_taxi_data_clickhouse_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_to_completion,
    sessionize_stream,
    stream_dedup,
)

__all__ = [
    "read_events_stream",
    "hourly_rollup_stream",
    "stream_dedup",
    "sessionize_stream",
    "run_to_completion",
]
