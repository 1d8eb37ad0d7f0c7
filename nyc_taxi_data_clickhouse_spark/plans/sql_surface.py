"""Extended SQL-surface suite entries: correlated-subquery shapes,
window frames, set operations, statistical aggregates, deterministic
sampling, and time-series gap-fill.

The reference is batch-SQL-only with four aggregation queries
(src/benchmark_clickhouse.sh:3-14); these entries extend the engine's
query surface the way SURVEY §7 prescribes — every shape expressed
declaratively so Catalyst plans it (scalar subqueries become
broadcast-joined single-row relations, EXISTS/NOT EXISTS become
left-semi/anti hash joins, window frames stay in a single shuffle per
partitioning key).

Scale notes (100 TB):
- Scalar subqueries (global avg) reduce to a 1-row broadcast — no
  driver collect, no second scan barrier beyond the agg itself.
- Q18-shape (HAVING-filtered IN subquery) aggregates lineitem FIRST
  (map-side partial combine shrinks 100 TB to |orders| rows) and only
  then joins back — never the other way around.
- Window shapes shuffle once on their partition key; the running-sum /
  lag / ntile frames are all streaming-friendly within a partition
  (no buffering beyond the frame).
- The gap-fill calendar is generated from a 1-row aggregate via
  `sequence` + `explode` — O(days), never O(rows) — then LEFT-joined
  broadcast against the pre-aggregated dailies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nyc_taxi_data_clickhouse_spark.suite import load_events, load_table, register


# ===========================================================================
# Correlated-subquery shapes (TPC-H Q2 / Q4 / Q12 / Q16 / Q18 / Q22 analogs)
# ===========================================================================

@register(
    "scalar_subquery_min",
    """
    SELECT l.l_partkey, l.l_suppkey, l.l_orderkey,
           round(l.l_extendedprice, 2) AS min_price
    FROM lineitem l
    WHERE l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q2 shape: correlated scalar-subquery min-per-group, "
    "planned as a single window min (one shuffle on the group key) "
    "instead of agg+self-join (two scans)",
)
def scalar_subquery_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey")
    return (
        li.withColumn("__min", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min"))
        .select(
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
    )


@register(
    "exists_correlated",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a non-equi residual "
    "condition -> left-semi hash join on the equi key, residual as "
    "join filter; then 1-key count",
)
def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "not_exists_above_avg",
    """
    SELECT n.n_name, count(*) AS n_cust, round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar subquery (global avg -> "
    "1-row broadcast, no driver collect) + NOT EXISTS anti join + "
    "broadcast dim join",
)
def not_exists_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.agg(F.avg("c_acctbal").alias("__avg"))
    rich = c.join(broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg"), "inner")
    inactive = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        inactive.join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "groupby_having_join_back",
    """
    SELECT c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
           round(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 220) t
      ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: IN (GROUP BY ... HAVING) subquery -> aggregate "
    "the big fact FIRST (partial combine shrinks it to |orders| keys), "
    "then join back; never join-then-aggregate at 100 TB",
)
def groupby_having_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 220)
    )
    return (
        o.join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("__qty", 2).alias("total_qty"),
        )
    )


@register(
    "conditional_agg_case",
    """
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY year(l.l_shipdate)
    """,
    doc="TPC-H Q12 shape: CASE-based conditional aggregation (pivots a "
    "predicate into parallel sums in one pass; no second scan)",
)
def conditional_agg_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "distinct_count_excl",
    """
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: NOT IN exclusion subquery (anti join against "
    "a broadcast-sized key set) + count(DISTINCT) over 2 group keys",
)
def distinct_count_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: top-20 revenue from returned items — filter pushed "
    "below the join, fact aggregated on customer key, TakeOrdered "
    "top-k (no global sort); c_custkey tie-break keeps LIMIT "
    "deterministic",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ===========================================================================
# Window-frame varieties (running total, lag delta, ntile, moving average)
# ===========================================================================

@register(
    "window_running_total",
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    """,
    doc="window frame: per-customer running sum (ROWS UNBOUNDED "
    "PRECEDING — streaming frame, no per-row buffering; one shuffle "
    "on the partition key)",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag_delta",
    """
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS DOUBLE) AS days_since_prev
    FROM orders
    """,
    doc="window frame: lag() inter-order gap in days (NULL for each "
    "customer's first order; DOUBLE on both sides because a nullable "
    "int column widens to float64 through the oracle's pandas bridge)",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("double").alias("days_since_prev"),
    )


@register(
    "window_ntile",
    """
    SELECT n_name, quartile, count(*) AS n_cust,
           round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
    FROM (
      SELECT n.n_name, c.c_acctbal,
             ntile(4) OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal, c.c_custkey) AS quartile
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey)
    GROUP BY n_name, quartile
    """,
    doc="window frame: ntile(4) acctbal quartiles per nation "
    "(full ORDER BY incl. unique key keeps tile assignment "
    "deterministic), then per-tile stats",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    return (
        c.join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select("n_name", "c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("n_name", "quartile")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


@register(
    "moving_average",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             sum(l_extendedprice) AS revenue
      FROM lineitem GROUP BY 1)
    SELECT day,
           round(revenue, 2) AS revenue,
           round(avg(revenue) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
    FROM daily
    """,
    doc="time-series: 7-day moving average over pre-aggregated dailies "
    "— aggregate first (100 TB -> O(days) rows), window second; the "
    "single-partition window is safe because its input is tiny",
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum("l_extendedprice").alias("__rev")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.round("__rev", 2).alias("revenue"),
        F.round(F.avg("__rev").over(w), 2).alias("ma7"),
    )


# ===========================================================================
# Set operations
# ===========================================================================

@register(
    "intersect_distinct",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
    """,
    doc="§2.7 extension: INTERSECT (distinct) — customers active in "
    "both years; plans as aggregate + semi join",
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y00 = o.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y95.intersect(y00)


@register(
    "except_distinct",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
    """,
    doc="§2.7 extension: EXCEPT (distinct) — churned customers; plans "
    "as aggregate + anti join",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y00 = o.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y95.subtract(y00)


# ===========================================================================
# Statistical aggregates
# ===========================================================================

@register(
    "stats_agg",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_discount), 4) AS sd_discount,
           round(var_samp(l_quantity), 4) AS var_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 extension: statistical aggregates (corr / covar_samp / "
    "stddev_samp / var_samp) — single-pass partial+final moment "
    "accumulation, same shuffle profile as sum()",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 4).alias("sd_discount"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
    )


# ===========================================================================
# Deterministic sampling
# ===========================================================================

@register(
    "deterministic_sample",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE ((l_orderkey % 999999937) * 7 + l_linenumber) % 100 <
          CASE WHEN l_returnflag = 'R' THEN 20 ELSE 5 END
    """,
    doc="sampling: deterministic stratified sample via key-hash mod "
    "(20% of returns, 5% otherwise) — reproducible across engines and "
    "runs, unlike TABLESAMPLE; pure map-side filter, no shuffle",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rate = F.when(F.col("l_returnflag") == "R", 20).otherwise(5)
    # mod-reduce before multiplying: keeps the product in int64 at any
    # key scale (engines disagree on overflow semantics, see
    # train_val_test_split)
    bucket = ((F.col("l_orderkey") % 999999937) * 7 + F.col("l_linenumber")) % 100
    return li.filter(bucket < rate).select("l_orderkey", "l_linenumber", "l_returnflag")


# ===========================================================================
# Time-series gap-fill
# ===========================================================================

@register(
    "gapfill_timeseries",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      FROM orders GROUP BY 1),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    calendar AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds)
    SELECT c.day, coalesce(d.n_orders, 0) AS n_orders
    FROM calendar c LEFT JOIN daily d ON d.day = c.day
    """,
    doc="time-series: zero-filled daily gap-fill — calendar generated "
    "from a 1-row min/max aggregate via sequence+explode (O(days), "
    "never O(rows)), LEFT-joined against pre-aggregated dailies",
)
def gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    calendar = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    return calendar.join(daily, "day", "left").select(
        "day", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


# ===========================================================================
# Events funnel (conditional-min conversion analysis)
# ===========================================================================

@register(
    "events_funnel",
    """
    SELECT user_id,
           CASE WHEN min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
                 AND min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
                 AND min(CASE WHEN event_type = 'view' THEN ts END) <
                     min(CASE WHEN event_type = 'purchase' THEN ts END)
                THEN 1 ELSE 0 END AS converted
    FROM events
    GROUP BY user_id
    """,
    doc="events: view->purchase funnel via conditional-min aggregation "
    "— one pass, one shuffle on user_id; no self-join of the event "
    "stream",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    first_buy = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return e.groupBy("user_id").agg(
        F.when(
            first_view.isNotNull() & first_buy.isNotNull() & (first_view < first_buy),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )


# ===========================================================================
# Deeper TPC-H analogs (Q7 / Q8 / Q17 / Q20)
# ===========================================================================

@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, ship_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    doc="TPC-H Q7: bidirectional nation-pair trade volume by year — the "
    "nation filter lands on both broadcast dims so the fact rows are "
    "pruned during the join, not after",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT order_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA')
    GROUP BY order_year
    """,
    doc="TPC-H Q8: one nation's market share inside a region's customer "
    "base, by year — numerator as a conditional sum in the SAME "
    "aggregation pass as the denominator (no second scan, no join of "
    "two aggregates)",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = broadcast(
        n.join(broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")).select(
            F.col("n_nationkey").alias("n2_key")
        )
    )
    n1 = broadcast(
        n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("n2_key") == F.col("c_nationkey"))
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("n1_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17: correlated scalar avg * constant threshold — the "
    "per-part average is a window aggregate over the already-filtered "
    "brand subset's parts (the brand filter is pushed below the "
    "window's shuffle via the part join)",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # join first so the window only shuffles the brand's lineitems;
    # the correlated subquery in the oracle scans per-part over ALL
    # lineitem, but avg(l_quantity) per part is identical on the
    # brand-filtered subset because the filter is on the part side
    w = W.partitionBy("l_partkey")
    branded = li.join(
        broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey")
    )
    return (
        branded.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q20_nested_in",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%widget%'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 400)
    """,
    doc="TPC-H Q20 shape: nested IN over a HAVING-filtered aggregate — "
    "aggregate lineitem down to supplier keys first, then left-semi "
    "join the supplier dim against that small key set",
)
def tpch_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    keys = (
        li.join(broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 400)
        .select("l_suppkey")
    )
    return s.join(
        broadcast(keys), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


# ===========================================================================
# Fuzzy string matching + approximate percentiles
# ===========================================================================

@register(
    "fuzzy_levenshtein",
    """
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM (SELECT DISTINCT p_name FROM part) a
    JOIN (SELECT DISTINCT p_name FROM part) b
      ON a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="fuzzy matching: Levenshtein pairs over the DISTINCT name "
    "domain (dedup before the quadratic comparison — at scale, block "
    "first via length/prefix/LSH so the cross join is per-bucket)",
)
def fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    )


@register(
    "approx_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 extension: approx_percentile (Greenwald-Khanna sketch, "
    "mergeable across partitions — the 100 TB path where exact "
    "percentile's global sort is not viable).  Sketch values are "
    "engine-specific, so the entry computes BOTH the sketch and the "
    "exact interpolated percentile in one agg and reports the "
    "bounded-error check Spark-side; the oracle pins exact values + "
    "the bound (the approx_distinct pattern); tighter bound in pytest",
)
def approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("__e50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("__e90"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9], 10000).alias("__a"),
    )
    close = (
        (F.abs(F.col("__a")[0] - F.col("__e50")) / F.col("__e50") < 0.01)
        & (F.abs(F.col("__a")[1] - F.col("__e90")) / F.col("__e90") < 0.01)
    )
    return agg.select(
        "l_returnflag",
        F.round("__e50", 4).alias("exact_p50"),
        F.round("__e90", 4).alias("exact_p90"),
        close.alias("approx_within_1pct"),
    )


# ===========================================================================
# JSONL source/sink roundtrip + streaming interval join
# ===========================================================================

@register(
    "json_roundtrip_identity",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
    doc="§2.1 extension: gzipped JSON-lines sink + explicit-schema "
    "source roundtrip (identity oracle) — the corpus interchange "
    "format LLM pipelines actually use",
)
def json_roundtrip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.scratch import scratch_dir
    from nyc_taxi_data_clickhouse_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    out = scratch_dir("json_roundtrip_")
    write_jsonl(docs, out, max_records_per_file=20_000)
    return read_jsonl(
        spark,
        out,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).select("doc_id", "text", "lang", "source", "n_chars")


@register(
    "streaming_click_purchase_join",
    """
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="§2.9 extension: watermarked stream-stream interval join "
    "(click->purchase within 1h), drained with availableNow — oracle "
    "is the batch interval join; the two-sided time bound is what "
    "lets Spark expire join state instead of growing it forever",
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from nyc_taxi_data_clickhouse_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
        stream_stream_join,
    )

    path = f"{sf_dir}/events.parquet"
    clicks = read_events_stream(spark, path).filter(F.col("event_type") == "click")
    purchases = read_events_stream(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    return run_to_completion(
        stream_stream_join(clicks, purchases, horizon="1 hour"),
        f"ssjoin_{uuid.uuid4().hex[:8]}",
    )


# ===========================================================================
# Histogram bucketing + deterministic group-concat
# ===========================================================================

@register(
    "value_histogram",
    """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
    doc="§2.4 extension: fixed-width histogram via arithmetic "
    "bucketing (floor(v/width)) — a 1-key hash agg, no sort; the "
    "portable form of width_bucket",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    return e.groupBy(
        F.floor(F.col("value") / 25.0).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@register(
    "group_concat_sorted",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="§2.4 extension: deterministic group-concat — collect_set "
    "sorted before joining, so the result is order-stable across "
    "partitionings (unordered collect_list would be flaky at scale)",
)
def group_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("cnt"),
    )


# ===========================================================================
# Merge upsert (latest-wins) + argmax-per-group
# ===========================================================================

@register(
    "upsert_latest_wins",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1000 AS o_totalprice,
             o_orderdate + INTERVAL 1 DAY AS o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0),
    unioned AS (
      SELECT * FROM orders UNION ALL SELECT * FROM updates),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY o_orderdate DESC) AS rn
      FROM unioned)
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderdate
    FROM ranked WHERE rn = 1
    """,
    doc="merge upsert (latest-wins): union current+updates, keep the "
    "newest version per key via one window shuffle — the "
    "recompute-and-overwrite pattern immutable parquet needs in place "
    "of MERGE; updates are a simulated price-adjustment batch (an "
    "exact additive bump, so both engines round identically)",
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.plans.upsert import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("o_orderdate"),
        "o_orderpriority",
    )
    merged = merge_upsert(o, updates, ["o_orderkey"], "o_orderdate")
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderdate"
    )


@register(
    "argmax_per_group",
    """
    SELECT user_id, event_type AS top_type, n
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    """,
    doc="argmax-per-group: each user's most frequent event type — "
    "aggregate first (shrinks to |user x type|), then a window "
    "row_number with a lexicographic tie-break for determinism; the "
    "portable, tie-stable form of mode()/max_by()",
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load_events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
    )
