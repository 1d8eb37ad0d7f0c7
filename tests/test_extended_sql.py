"""Extended-SQL-surface tests that the oracle can't express:
approx-distinct accuracy and as-of join edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.plans.asof import asof_join
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_tolerance(spark):
    li = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(F.approx_count_distinct("l_partkey").alias("a")).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.05


def test_asof_join_edge_semantics(spark):
    ts = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),  # after r1 -> 100.0
            (2, 10, ts("2024-01-01 11:00:00")),  # exactly at r2 -> 200.0 (<=)
            (3, 10, ts("2024-01-01 09:00:00")),  # before any right -> NULL
            (4, 20, ts("2024-01-01 12:00:00")),  # other key, no right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01 09:30:00"), 100.0),
            (10, ts("2024-01-01 11:00:00"), 200.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, value_cols=("value",)).collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_asof_join_keeps_all_left_rows(spark):
    from nyc_taxi_data_clickhouse_spark.suite import load_events

    e = load_events(spark, SF_CORRECTNESS)
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(clicks, purchases, value_cols=("value",))
    assert joined.count() == clicks.count()


def test_approx_percentile_within_error_bound(spark):
    """Greenwald-Khanna sketch at accuracy 10000 stays within 1% of the
    exact interpolated percentile on every returnflag group."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_CORRECTNESS

    li = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
    both = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("approx"),
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
            "exact"
        ),
    )
    for r in both.collect():
        for a, e in zip(r["approx"], r["exact"]):
            assert abs(a - e) / e < 0.01, (r["l_returnflag"], a, e)


def test_merge_upsert_update_wins_version_tie(spark):
    """Latest version wins; on an exact version tie the UPDATE side
    must win (deterministic reprocessing semantics)."""
    from nyc_taxi_data_clickhouse_spark.plans.upsert import merge_upsert

    cur = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], "k long, v string, ver long"
    )
    upd = spark.createDataFrame(
        [(1, "new-tied", 10), (3, "insert", 5)], "k long, v string, ver long"
    )
    got = {
        (r["k"], r["v"]) for r in merge_upsert(cur, upd, ["k"], "ver").collect()
    }
    assert got == {(1, "new-tied"), (2, "keep"), (3, "insert")}


def test_hll_sketch_merge_accuracy_and_consistency(spark):
    """Monthly-sketch rollup must (a) estimate yearly distinct
    customers within HLL error bounds and (b) equal the estimate of a
    sketch built directly at yearly grain — merge associativity, the
    property the persisted-sketch-table pattern depends on."""
    from nyc_taxi_data_clickhouse_spark.plans.surface_gaps import hll_sketch_merge
    from tests.conftest import SF_CORRECTNESS

    o = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    merged = {
        r["yr"]: r["n"]
        for r in monthly.groupBy("yr")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()
    }
    exact = {
        r["yr"]: r["n"]
        for r in o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    direct = {
        r["yr"]: r["n"]
        for r in o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("o_custkey", F.lit(14))
            ).alias("n")
        )
        .collect()
    }
    assert set(merged) == set(exact)
    for yr, est in merged.items():
        assert abs(est - exact[yr]) / exact[yr] < 0.02, (yr, est, exact[yr])
        assert est == direct[yr], "union of partials must equal direct sketch"

    # the registry entry reports the same bound as a driver-hashable
    # boolean next to the exact counts
    entry = hll_sketch_merge(spark, SF_CORRECTNESS).collect()
    assert {r["yr"]: r["exact_customers"] for r in entry} == exact
    assert all(r["merged_within_2pct"] for r in entry)
