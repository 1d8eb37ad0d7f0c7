"""Second extension-surface batch: value-based RANGE window frames,
rank statistics, schema-evolution union, and an ORC source/sink
roundtrip.

Fills the remaining gaps a reference user would hit moving real
workloads onto the engine: time-valued window frames (RANGE BETWEEN
INTERVAL ... PRECEDING — distinct from the row-counted frames in
plans/sql_surface.py), the full ranking-statistics family, reading
across schema versions of the same table (the evolution story
immutable parquet needs), and the ORC columnar format as an
alternative to parquet (SURVEY §2.1 S1-S6 generalized).

Scale notes:
- The RANGE frame shuffles once on its partition key; within a
  partition Spark evaluates the sliding interval incrementally over
  the sorted run — no per-row rescan, state is the frame width.
- Schema-evolution union is a metadata operation: unionByName with
  allowMissingColumns pads the missing columns with NULL literals at
  plan time; no data movement beyond the two scans.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.suite import load_table, register


@register(
    "window_range_frame",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rev_7d_e4
    FROM lineitem
    """,
    doc="value-based RANGE window frame: per-supplier trailing-7-day "
    "revenue at every lineitem — RANGE over event time (all peers "
    "within the interval), not ROWS; Spark side orders by epoch "
    "seconds with rangeBetween(-7*86400, 0), the interval-typed "
    "equivalent.  Revenue is fixed-point (1e-4 units): scaling to "
    "exact integers BEFORE the sliding sum makes the sum "
    "order-independent and bit-exact across engines — rounding a "
    "double sum instead flips half-cent boundary values (observed 81 "
    "of 60k rows at sf0.01)",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp("l_shipdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    rev_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum(rev_e4).over(w).alias("rev_7d_e4"),
    )


@register(
    "window_rank_stats",
    """
    SELECT c_custkey, c_mktsegment,
           dense_rank() OVER w AS drank,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="ranking-statistics family (dense_rank / percent_rank / "
    "cume_dist) over one shared window — one shuffle on the segment "
    "key serves all three; tie-broken on the key for determinism",
)
def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "schema_evolution_union",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS src
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice,
           o_orderpriority, 'v2' AS src
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    doc="schema evolution across snapshot versions: a v1 snapshot "
    "(price, no priority) unioned with a v2 snapshot (priority, no "
    "price) via unionByName(allowMissingColumns) — missing columns "
    "NULL-padded at plan time, the batch analog of parquet "
    "mergeSchema reads",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    v1 = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("src", F.lit("v1"))
    )
    v2 = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .withColumn("src", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@register(
    "orc_roundtrip_identity",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM orders",
    doc="§2.1 generalization: ORC columnar sink + source roundtrip "
    "(identity oracle) — same partitioned-write path as the parquet "
    "gold table, demonstrating the format layer is pluggable",
)
def orc_roundtrip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    from nyc_taxi_data_clickhouse_spark.scratch import scratch_dir

    out = scratch_dir("orc_roundtrip_")
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


@register(
    "incremental_avg_merge",
    """
    SELECT o_orderstatus AS status,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                 / count(*), 6) AS avg_price,
           count(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
    doc="materialized-view maintenance pattern: per-month PARTIAL "
    "aggregation state (exact cents sum + count — mergeable, unlike "
    "avg itself) re-merged into the final per-status average; at "
    "100 TB only changed months recompute their partials and the "
    "merge touches |months x statuses| rows.  The oracle is the "
    "direct one-pass aggregate — partial+merge must be exactly "
    "equivalent, which the fixed-point sum guarantees",
)
def incremental_avg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    partials = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.sum(cents).alias("sum_cents"), F.count("*").alias("n"))
    return partials.groupBy("status").agg(
        F.round(
            (F.sum("sum_cents") / 100.0) / F.sum("n"), 6
        ).alias("avg_price"),
        F.sum("n").alias("cnt"),
    )


@register(
    "intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="bag-semantics INTERSECT ALL (multiplicity = min of the two "
    "sides) — planned as an aggregate of per-side counts, one shuffle "
    "per side, no row-by-row matching",
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@register(
    "except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="bag-semantics EXCEPT ALL (multiplicity = left minus right, "
    "floored at 0) — completes the set-operation family next to the "
    "DISTINCT variants in plans/sql_surface.py",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@register(
    "window_first_last_nth",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order,
           coalesce(nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1)
             AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="navigation window functions: each customer's first / last / "
    "second order — note last_value and nth_value need the explicit "
    "UNBOUNDED FOLLOWING frame (the default frame stops at CURRENT "
    "ROW, a classic cross-engine footgun both engines share); DISTINCT "
    "collapses the per-row window output to one row per customer; "
    "second_order uses a -1 sentinel for single-order customers "
    "because a NULL-bearing int column widens to float in the "
    "oracle's pandas bridge and would hash-mismatch",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.coalesce(
            F.nth_value("o_orderkey", 2).over(full), F.lit(-1).cast("long")
        ).alias("second_order"),
    ).distinct()
