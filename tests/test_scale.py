"""Scale-technique tests: bucketed joins skip the shuffle; salted
joins produce identical results to plain joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.plans.scale import (
    explain_has_shuffle,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")

    write_bucketed(li, "li_bucketed", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed(o, "o_bucketed", "o_orderkey", 8, path=str(tmp_path / "o"))

    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    # disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        assert not explain_has_shuffle(joined), (
            "bucketed-to-bucketed equi-join must not shuffle"
        )
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert explain_has_shuffle(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_agg_skips_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(li, "li_bucketed_agg", "l_orderkey", 8, path=str(tmp_path / "li2"))
    try:
        agg = spark.table("li_bucketed_agg").groupBy("l_orderkey").count()
        assert not explain_has_shuffle(agg), "agg on the bucket key must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey", how)
    salted = salted_join(li, o, "l_orderkey", salt_buckets=8, how=how)
    assert salted.count() == plain.count()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"], r["o_totalprice"])
    assert {key(r) for r in salted.collect()} == {key(r) for r in plain.collect()}


def _plan(spark, name: str) -> str:
    from nyc_taxi_data_clickhouse_spark import suite

    df = suite.registry()[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q10_plan_broadcasts_and_pushes_filters(spark):
    """Q10's dims must broadcast (no shuffle of the fact for dim
    lookups), the returnflag/date filters must reach the parquet scan,
    and top-k must plan as TakeOrdered, not a global sort."""
    plan = _plan(spark, "tpch_q10_returned_items")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan
    assert "TakeOrderedAndProject" in plan


def test_exists_correlated_plans_as_semi_join(spark):
    """The EXISTS subquery must become a semi join with the non-equi
    residual as a join condition — never a full join + dedup."""
    plan = _plan(spark, "exists_correlated")
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan


def test_scalar_subquery_min_single_shuffle(spark):
    """The window min-per-group shape must shuffle exactly once (on
    the partition key) — not the agg+self-join form's two scans."""
    import re

    plan = _plan(spark, "scalar_subquery_min")
    # count numbered operator headers "(N) Op" — the tree rendering
    # above them repeats every operator name once more
    ops = [m.group(1) for m in re.finditer(r"\(\d+\) (\w+)", plan)]
    assert ops.count("Exchange") == 1
    assert ops.count("Window") == 1
    assert ops.count("Scan") == 1


def test_moving_average_aggregates_before_window(spark):
    """The dailies aggregation must run below the single-partition
    window, so the unpartitioned window only ever sees O(days) rows."""
    plan = _plan(spark, "moving_average")
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # formatted explain lists operators leaves-last; the window must
    # appear ABOVE (earlier than) only the final projection, and the
    # aggregate must exist on the scan side
    assert "Window" in plan and "HashAggregate" in plan


def test_contamination_broadcasts_benchmark_set(spark):
    """The benchmark shingle table is tiny by contract (2% of docs);
    it must broadcast so the training-side shingles never shuffle."""
    plan = _plan(spark, "contamination_ngram")
    assert "BroadcastHashJoin" in plan


def _py_morton(vals, bits):
    out = 0
    n = len(vals)
    for b in range(bits):
        for d, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * n + d)
    return out


def test_zorder_key_matches_reference(spark):
    from nyc_taxi_data_clickhouse_spark.plans.scale import zorder_key

    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (2**21 + 5, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [r["z"] for r in df.select(zorder_key(["x", "y"]).alias("z")).collect()]
    clamp = (1 << 21) - 1
    want = [_py_morton((min(x, clamp), min(y, clamp)), 21) for x, y in rows]
    assert got == want


def test_zorder_layout_prunes_on_second_dimension(spark, tmp_path):
    """With a plain x-sort every file spans the full y range, so a
    y-filter can prune nothing; Z-order keeps per-file y ranges tight
    so most files' min/max stats exclude a narrow y window."""
    import pyarrow.parquet as pq
    import glob

    df = (
        spark.range(0, 1 << 14)
        .select(
            (F.hash("id") % 1024).alias("hx"),
            (F.hash(F.col("id") + 1) % 1024).alias("hy"),
        )
        .select(F.abs("hx").alias("x").cast("long"), F.abs("hy").alias("y").cast("long"))
    )

    from nyc_taxi_data_clickhouse_spark.plans.scale import write_zordered

    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def files_intersecting_y_window(path, lo=0, hi=63):
        hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ymin = min(
                md.row_group(i).column(1).statistics.min
                for i in range(md.num_row_groups)
            )
            ymax = max(
                md.row_group(i).column(1).statistics.max
                for i in range(md.num_row_groups)
            )
            if ymax >= lo and ymin <= hi:
                hit += 1
        return hit

    z_hits = files_intersecting_y_window(zpath)
    x_hits = files_intersecting_y_window(xpath)
    assert z_hits < x_hits, (z_hits, x_hits)


def test_q21_single_scan_window_rewrite(spark):
    """The EXISTS / NOT EXISTS pair is rewritten into two collect_set
    window counts over one order-key partition: no semi/anti joins
    with non-equi residuals, no correlated per-row subquery, and
    lineitem is scanned ONCE (the literal form scans it three times —
    at 100 TB that is the whole game)."""
    plan = _plan(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "Window" in plan
    tree = plan.split("\n\n")[0]  # operator tree; node details repeat names
    assert tree.count("Scan parquet") == 3  # lineitem + orders + supplier


def test_q19_or_predicate_stays_in_broadcast_join(spark):
    """Q19's OR-of-conjuncts joins lineitem to a pre-filtered
    broadcast part — no shuffle of the big side."""
    plan = _plan(spark, "tpch_q19_discounted_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q13_aggregates_orders_before_customer_join(spark):
    """The distribution agg's input join must see orders already
    reduced per customer: the plan has a partial+final HashAggregate
    BELOW the join (count per o_custkey), so the join input is
    |customer|-sized at any scale."""
    plan = _plan(spark, "tpch_q13_customer_distribution")
    join_pos = plan.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = plan.find("BroadcastHashJoin")
    assert join_pos != -1
    assert "HashAggregate" in plan


def test_q6_filters_push_down_and_columns_prune(spark):
    """SURVEY §4 X9: the q6-shape predicate (shipdate range, discount
    band, quantity cap) must reach the parquet scan as PushedFilters,
    and the scan must read only the four referenced columns."""
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual" in plan or "LessThan" in plan
    # column pruning: untouched wide columns must not be in ReadSchema
    import re

    read_schemas = re.findall(r"ReadSchema: (.*)", plan)
    assert read_schemas and all("l_returnflag" not in s for s in read_schemas)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from nyc_taxi_data_clickhouse_spark.plans.scale import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(0, 50_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    before, after = compact_parquet(spark, src, dst, target_file_mb=128,
                                    sort_cols=["id"])
    assert before == 64 and after < 8
    out = spark.read.parquet(dst)
    assert out.count() == 50_000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """Scale hazard #1 (SURVEY §7): one hot key in a shuffle join.
    With AQE skew-join on, the runtime plan must split the oversized
    partition — asserted via the final adaptive plan's skew markers
    (SortMergeJoin(skew=true) / AQEShuffleRead skewed).  This is the
    no-salting-needed path; plans/scale.salted_join covers the
    explicit-salting alternative.  Note: the join must be executed
    bare (no downstream distribution requirement) or AQE declines the
    split to preserve the required partitioning."""
    left_p, right_p = str(tmp_path / "l"), str(tmp_path / "r")
    (
        spark.range(0, 900_000)
        .select(
            F.when(F.col("id") < 800_000, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            # incompressible payload so shuffle-size stats see the skew
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(left_p)
    )
    spark.range(0, 1000).select(F.col("id").alias("k2")).write.mode(
        "overwrite"
    ).parquet(right_p)

    conf = spark.conf
    saved_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # thresholds scaled down so test-sized data triggers the split
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        joined = spark.read.parquet(left_p).join(
            spark.read.parquet(right_p), F.col("k") == F.col("k2")
        )
        # JVM-side action on THIS DataFrame's QueryExecution, so the
        # adaptive plan attached to it finalizes
        n = joined._jdf.queryExecution().toRdd().count()
        assert n == 900_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)
        conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")


def test_dynamic_partition_pruning_on_gold_layout(spark, tmp_path):
    """A hive-partitioned fact joined to a filtered dim must plan a
    dynamicpruning partition filter: at 100 TB only the partitions the
    dim filter selects are scanned, decided at runtime (SURVEY §4 X2
    generalized past static pruning)."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    fact_path = str(tmp_path / "orders_by_year")
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    years = [r["o_year"] for r in fact.select("o_year").distinct().collect()]
    dim = spark.createDataFrame(
        [(y, "keep" if y == min(years) else "drop") for y in years],
        "d_year int, label string",
    )
    joined = fact.join(dim, fact.o_year == dim.d_year).filter(
        F.col("label") == "keep"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = fact.filter(F.col("o_year") == min(years)).count()
    assert joined.count() == expected


def test_runtime_bloom_filter_prunes_join_probe(spark, tmp_path):
    """With broadcast off, Spark's runtime row-level filtering should
    inject a bloom filter built from the selective side into the large
    side's scan — the shuffle then carries only probable-match rows, a
    major shuffle-volume saver at 100 TB."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        # test data is KBs; drop the 10GB "only bother on big scans" floor
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_term_cooccurrence_topk_broadcast_and_cache(spark):
    """The collocation self-join must (a) broadcast the tiny df-band
    vocab rather than shuffling the token table for the semi-join,
    (b) plan the top-50 as TakeOrdered, never a global sort, and
    (c) read the shared token table from cache — without the persist
    Catalyst re-executes tokenize->distinct once per referencing
    subtree (the VERDICT r3 Jaccard recompute failure mode)."""
    plan = _plan(spark, "term_cooccurrence")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_mad_outliers_broadcasts_group_stats(spark):
    """Both model joins (median, MAD per group) carry tiny per-group
    tables — they must broadcast, never sort-merge the fact side."""
    plan = _plan(spark, "mad_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_single_full_outer_join(spark):
    """CDC diff is exactly one keyed full outer join — no extra
    shuffle beyond the two sides' exchanges and no nested-loop plan."""
    import re

    plan = _plan(spark, "snapshot_diff")
    assert plan.count("SortMergeJoin FullOuter") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_transition_single_window_sort(spark):
    """The transition matrix must reuse ONE per-user sort for both lag
    columns (a single Window node), then hash-aggregate — never a
    self-join of the event table."""
    plan = _plan(spark, "event_transition_counts")
    assert plan.count("Window") >= 1
    assert "Join" not in plan
