"""Round-5 surface extensions.

- ``streaming_session_window_append``: the PRODUCTION form of
  sessionization — ``withWatermark`` + append output — whose
  complete-mode twin (``round4_ops.streaming_session_window``) is
  test/bounded-drain only because it retains all state.  This entry
  demonstrates (and oracle-gates) the emit-once/evict semantics an
  unbounded stream needs.

Reference: the reference has no streaming surface at all (SURVEY §2.9
is an extension); the session shapes mirror its GROUP-BY-over-time
analyses re-expressed over event time.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.suite import load_table, register


@register(
    "streaming_session_window_append",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    agg AS (
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS cnt,
             round(sum(value), 2) AS total_value
      FROM sess GROUP BY user_id, sid),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
    SELECT agg.user_id, agg.session_start, agg.session_end,
           agg.cnt, agg.total_value
    FROM agg, wm WHERE agg.session_end < wm.wm
    """,
    doc="§2.9: PRODUCTION sessionization — session_window (30-min gap) "
    "with withWatermark(ts, 1h) in APPEND mode: a session is emitted "
    "exactly once, when the watermark passes its end, and its state is "
    "then evicted — the shape that runs unbounded at 100 TB, unlike "
    "the complete-mode twin (streaming_session_window) whose state and "
    "sink grow forever.  availableNow's final no-data batch advances "
    "the watermark to max(ts) - 1h, so the emitted set is exactly the "
    "sessions with end < max(ts) - 1h; trailing sessions stay in state "
    "(on a real stream they emit as the watermark advances).  Oracle: "
    "batch gaps-and-islands sessions filtered by that emission rule.  "
    "Scale: state shards by (user_id, session), eviction is "
    "watermark-bounded, checkpointable across restarts",
)
def streaming_session_window_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "cnt",
            "total_value",
        )
    )
    name = f"sessapp_{uuid.uuid4().hex[:8]}"
    return run_to_completion(agg, name, output_mode="append")


@register(
    "exact_median_bracket",
    """
    SELECT l_linenumber AS grp,
           round(median(l_extendedprice), 4) AS med
    FROM lineitem GROUP BY l_linenumber
    """,
    doc="§7 distributed order statistics: EXACT per-group median via "
    "operators.stats.exact_group_median — approx-percentile bracket + "
    "rank correction, the bounded-memory alternative to Spark's "
    "value-buffering exact percentile.  The builtin buffers every "
    "group value in one aggregation buffer (OOM at 100 TB group "
    "sizes); the bracket path's memory is O(sketch accuracy) + "
    "O(bracket width) regardless of group size, at the same wall "
    "time at sf0.1 (~1.0 s both, BENCH_NOTES round 5).  Oracle: "
    "DuckDB's exact interpolating median — any bracket-miss or "
    "interpolation error breaks the hash",
)
def exact_median_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.operators.stats import (
        exact_group_median,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    return exact_group_median(li, "grp", "x").select(
        "grp", F.round("med", 4).alias("med")
    )
