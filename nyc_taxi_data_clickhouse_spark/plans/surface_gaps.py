"""Third extension-surface batch: the remaining relational-shape gaps
a reference user would expect moving arbitrary workloads onto the
engine — full outer join, unpivot/melt, map-typed columns, a
slowly-changing-dimension (type 2) build, and positional explode.

SURVEY §2.3 lists the reference's joins as left-outer only and §2.7
records the absence of wide-to-long reshapes; these entries close
those declared-absent categories (SURVEY.md:144-146, 186-188) the
Spark-native way.

Scale notes:
- full outer join cannot broadcast either side (both must emit
  unmatched rows), so Spark plans a sort-merge join — one shuffle per
  side on the key; pre-aggregating the fact side first (as here)
  shrinks the shuffled payload to one row per key.
- unpivot is a zero-shuffle narrow map: each input row emits k output
  rows locally; the long format's row count is k x input, so always
  project/filter BEFORE melting at scale.
- the SCD2 build is two window passes over the same (custkey, date,
  orderkey) sort — Catalyst reuses one shuffle+sort for both, so the
  whole dimension build costs a single exchange of the change-log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.suite import load_table, register


@register(
    "full_outer_join",
    """
    WITH cust AS (
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'),
    urgent AS (
      SELECT o_custkey, count(*) AS n_urgent FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           c_name,
           coalesce(n_urgent, 0) AS n_urgent
    FROM cust FULL OUTER JOIN urgent ON c_custkey = o_custkey
    """,
    doc="full outer equi-join (SURVEY §2.3 declared-absent family): "
    "BUILDING-segment customers x urgent-order counts, keeping "
    "unmatched rows from BOTH sides — customers with no urgent orders "
    "(n_urgent=0 via coalesce; count(*)>=1 makes 0 unambiguous) and "
    "urgent customers outside the segment (c_name NULL).  Full outer "
    "cannot broadcast either side, so the plan is a sort-merge join; "
    "the fact side is pre-aggregated to one row per key before the "
    "shuffle, which is the scale-safe shape",
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cust = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    j = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
    )


@register(
    "unpivot_melt",
    """
    SELECT p_partkey, 'retailprice' AS metric,
           round(CAST(p_retailprice AS DOUBLE), 2) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    """,
    doc="unpivot / melt (wide->long reshape, SURVEY §2.7 extension): "
    "two numeric part attributes into (metric, val) pairs via "
    "DataFrame.unpivot — a zero-shuffle narrow map (each row emits k "
    "rows locally; the oracle's UNION ALL is the relational identity "
    "Spark's Expand node implements in one scan instead of k).  Both "
    "measures cast to a common double type, the unpivot precondition",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.round(F.col("p_retailprice").cast("double"), 2).alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "map_typed_ops",
    """
    WITH per AS (
      SELECT l_orderkey, l_linenumber, max(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey, l_linenumber)
    SELECT l_orderkey,
           count(*) AS n_lines,
           round(CAST(max(CASE WHEN l_linenumber = 1 THEN qty END)
                      AS DOUBLE), 2) AS qty_line1,
           bool_or(l_linenumber = 7) AS has_line7
    FROM per GROUP BY l_orderkey
    """,
    doc="map-typed column operations (SURVEY §1.2 notes no map types in "
    "the reference; this is the engine's coverage of them): per order, "
    "build map<linenumber, max quantity> with map_from_entries over a "
    "sorted collect_list, then size() / element_at() / "
    "map_contains_key() — the oracle expresses the same lookups "
    "relationally (count / conditional max / bool_or).  The testdata "
    "repeats linenumbers within an order, and map keys must be unique "
    "(Spark raises DUPLICATED_MAP_KEY rather than silently keeping "
    "one), so a per-(order, line) max pre-aggregation dedupes first — "
    "the general pattern for building maps from non-key-unique facts. "
    "Maps are built and consumed inside one aggregation and never "
    "cross a stage boundary",
)
def map_typed_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max("l_quantity").alias("qty")
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("l_linenumber", "qty")))
    )
    return (
        per.groupBy("l_orderkey")
        .agg(m.alias("m"))
        .select(
            "l_orderkey",
            F.size("m").cast("long").alias("n_lines"),
            F.round(F.element_at("m", F.lit(1)).cast("double"), 2).alias("qty_line1"),
            F.map_contains_key("m", F.lit(7)).alias("has_line7"),
        )
    )


@register(
    "scd2_dimension",
    """
    WITH h AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             lag(o_orderpriority) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    chg AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority FROM h
      WHERE prev IS NULL OR prev <> o_orderpriority)
    SELECT o_custkey AS custkey,
           o_orderpriority AS priority,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(coalesce(lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             TIMESTAMP '9999-12-31') AS DATE) AS valid_to,
           (lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             IS NULL) AS is_current
    FROM chg
    """,
    doc="slowly-changing-dimension type 2 build (training-data "
    "pipelines version dimension state the same way): collapse each "
    "customer's order-priority history into validity intervals — keep "
    "only change rows (lag differs), then valid_from = change date, "
    "valid_to = next change date (exclusive, 9999-12-31 open-ended), "
    "is_current on the last interval.  Both window passes share one "
    "(custkey, date, orderkey) sort, so the whole build is a single "
    "shuffle of the change-log; ties on date break by orderkey for "
    "cross-engine determinism",
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
    )
    nxt = F.lead("o_orderdate").over(w)
    return chg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.coalesce(nxt, F.lit("9999-12-31").cast("timestamp"))
        .cast("date")
        .alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "posexplode_ordinality",
    """
    SELECT p_partkey,
           CAST(generate_subscripts(s, 1) - 1 AS INT) AS pos,
           unnest(s) AS token
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS s FROM part)
    """,
    doc="positional explode (UNNEST WITH ORDINALITY): part-name tokens "
    "with their 0-based position — posexplode keeps the element index "
    "the plain explode in explode_tokens discards, which is what "
    "n-gram windows and positional features need.  Narrow map-side "
    "generator, no shuffle; oracle pairs DuckDB's unnest with "
    "generate_subscripts expanding in lockstep",
)
def posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "token"),
    )


@register(
    "ratio_to_report",
    """
    WITH agg AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS priority,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2)
    SELECT yr, priority, cnt,
           round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY yr), 6)
             AS share
    FROM agg
    """,
    doc="ratio-to-report / percent-of-total window: each priority's "
    "share of its year's orders — aggregate FIRST (5 priorities x "
    "years of groups), window over the tiny aggregate, never over raw "
    "rows; the unbounded sum partitioned by year is one pass over a "
    "result that fits in a single partition regardless of input scale",
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("cnt"))
    w = W.partitionBy("yr")
    return agg.select(
        "yr",
        "priority",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.sum("cnt").over(w), 6).alias(
            "share"
        ),
    )


@register(
    "regression_agg",
    """
    SELECT l_returnflag AS flag,
           round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="linear-regression aggregates (price ~ quantity per return "
    "flag): regr_slope / regr_intercept / regr_r2 / regr_count — "
    "single-pass mergeable moment sketches (sum, sum-of-squares, "
    "co-moment), so one partial->final hash aggregation like any "
    "count; no second pass, no collect.  Rounded to absorb "
    "parallel-summation ordering noise in the co-moments (Z6 policy)",
)
def regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 3).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 3).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@register(
    "null_safe_join",
    """
    WITH fact AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
    dim AS (SELECT DISTINCT seg FROM fact)
    SELECT d.seg, count(*) AS cnt
    FROM fact f JOIN dim d ON f.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg
    """,
    doc="null-safe equality join (Spark `<=>` / eqNullSafe ≡ SQL IS NOT "
    "DISTINCT FROM): the NULL-keyed rows (BUILDING mapped to NULL via "
    "nullif) MATCH the dim's NULL row instead of silently dropping — "
    "the semantic corner plain equi-joins get wrong and the reason "
    "merge/upsert keys must be null-safe.  Planner note: <=> is still "
    "an equi-join key for Spark (hash/sort-merge capable, broadcast "
    "here), not a degenerate theta join",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    fact = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    dim = fact.select("seg").distinct().withColumnRenamed("seg", "d_seg")
    return (
        fact.join(dim, fact.seg.eqNullSafe(dim.d_seg))
        .groupBy(F.col("d_seg").alias("seg"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "json_typed_parse",
    """
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)
             AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="typed JSON parse (from_json with an explicit schema — the "
    "structured counterpart to events_json_extract's per-path "
    "get_json_object): props parsed once into struct<k:int>, then "
    "aggregated.  One parse per row regardless of how many fields are "
    "consumed — per-path extraction re-parses the document per path, "
    "which at 100 TB is the difference between one and k JSON passes "
    "over every payload byte; malformed documents yield NULL struct "
    "fields (PERMISSIVE), not job failure",
)
def json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.suite import load_events

    e = load_events(spark, sf_dir)
    parsed = e.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg("p.k"), 4).alias("avg_k"),
        F.max("p.k").alias("max_k"),
    )


@register(
    "hll_sketch_merge",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS merged_within_2pct
    FROM orders GROUP BY yr ORDER BY yr
    """,
    doc="mergeable distinct-count sketches (Apache DataSketches HLL, "
    "SURVEY §2.4 extension past approx_count_distinct): per-(year, "
    "month) partial sketches of the customer set built in one pass, "
    "then rolled up to yearly distinct-customer estimates with "
    "hll_union_agg — the incremental pattern for 100 TB: persist the "
    "monthly sketch table (bytes per group, not customers per group) "
    "and every later rollup/backfill merges sketches instead of "
    "rescanning raw data.  Sketch estimates are engine-specific, so "
    "the entry joins the merged estimate against the exact yearly "
    "distinct and reports the <2% bound check Spark-side; the oracle "
    "pins exact counts + the bound.  Merge-vs-direct consistency and "
    "the accuracy bound are additionally pytest-gated",
)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    merged = monthly.groupBy("yr").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx")
    )
    exact = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return (
        exact.join(merged, "yr")
        .select(
            F.col("yr").cast("int").alias("yr"),
            "exact_customers",
            (
                F.abs(F.col("__approx") - F.col("exact_customers"))
                / F.col("exact_customers")
                < 0.02
            ).alias("merged_within_2pct"),
        )
        .orderBy("yr")
    )


@register(
    "locf_forward_fill",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_totalprice END AS px
      FROM orders)
    SELECT o_orderkey, o_custkey,
           round(last_value(px IGNORE NULLS) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 2) AS px_filled
    FROM t
    """,
    doc="LOCF forward-fill (last-observation-carried-forward): nulls "
    "in a per-customer price series (every third order masked "
    "deterministically) filled from the most recent non-null via "
    "last(..., ignorenulls=True) ≡ SQL last_value(... IGNORE NULLS) "
    "— the time-series repair primitive sensor/market pipelines need; "
    "leading nulls stay NULL (nothing to carry).  One shuffle on the "
    "partition key; unique (date, orderkey) ordering makes the "
    "default running frame row-deterministic on both engines",
)
def locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    masked = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("px"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return masked.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.last("px", ignorenulls=True).over(w), 2).alias("px_filled"),
    )


@register(
    "decimal_exact_money",
    """
    SELECT o_orderpriority AS priority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc="exact fixed-point money arithmetic (SURVEY Z6's opt-in "
    "DecimalType path): totals per priority in DECIMAL(18,2) — "
    "decimal sums are exact integers under the hood, so the result "
    "is bit-identical regardless of partial-aggregation order, no "
    "rounding policy needed — the final cast to double is presentation only, applied AFTER the exact sum (contrast q2_avg_by_key's "
    "round-the-double approach); the cast double→decimal itself is "
    "deterministic half-up on both engines",
)
def decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.sum(d).cast("double").alias("total"),
        F.min(d).cast("double").alias("lo"),
        F.max(d).cast("double").alias("hi"),
    )


_Q1_ANSI = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register(
    "sql_entry_point_parity",
    _Q1_ANSI,
    doc="SQL entry-point parity (SURVEY §3 E1): the SAME ANSI text the "
    "DuckDB oracle runs is executed verbatim through spark.sql over "
    "temp views — no DataFrame translation layer — proving the "
    "engine's SQL surface accepts the reference's query style "
    "directly (the reference's only repo-level IR is the SQL string, "
    "src/benchmark_clickhouse.sh:3-14).  Catalyst plans it identically "
    "to the DataFrame form: partial→final hash agg over a pruned, "
    "filter-pushed scan",
)
def sql_entry_point_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q1_ANSI)


@register(
    "windowed_distinct_users",
    """
    SELECT DISTINCT d,
           count(DISTINCT o_custkey) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                              AND CURRENT ROW) AS users_7d
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey
          FROM orders)
    """,
    doc="windowed distinct count (trailing-7-day active customers per "
    "day): Spark has no COUNT(DISTINCT) OVER, so the idiom is "
    "size(collect_set(...)) over the RANGE frame — run on day-grain "
    "DISTINCT (day, customer) pairs, never raw rows, so the "
    "unpartitioned global window sees bounded input (days x active "
    "customers/day, not order volume).  At 100 TB with huge daily "
    "actives, swap the exact set for the mergeable-sketch path "
    "(hll_sketch_merge): daily HLL sketches unioned over the trailing "
    "window — same shape, constant state per day",
)
def windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pairs = o.select(
        F.col("o_orderdate").cast("date").alias("d"), "o_custkey"
    ).distinct()
    day = F.datediff("d", F.lit("1970-01-01").cast("date"))
    w = W.orderBy(day).rangeBetween(-6, 0)
    return pairs.select(
        "d", F.size(F.collect_set("o_custkey").over(w)).cast("long").alias("users_7d")
    ).distinct()


@register(
    "cross_join_grid",
    """
    WITH grid AS (
      SELECT r_name, r_regionkey, p.pr FROM region
      CROSS JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders) p),
    cnt AS (
      SELECT n.n_regionkey, o.o_orderpriority AS pr, count(*) AS n_orders
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2)
    SELECT g.r_name, g.pr,
           CAST(coalesce(sum(cnt.n_orders), 0) AS BIGINT) AS n_orders
    FROM grid g
    LEFT JOIN cnt ON cnt.n_regionkey = g.r_regionkey AND cnt.pr = g.pr
    GROUP BY 1, 2
    """,
    doc="explicit cross join (dimension grid): region x priority full "
    "reporting grid, zero-filled where no orders exist — the one "
    "legitimate cross-product shape (tiny dim x tiny dim, a few dozen "
    "rows) and the standard fix for 'missing groups drop out of "
    "GROUP BY'.  Spark's crossJoin on two broadcast-small inputs "
    "plans BroadcastNestedLoopJoin, never a shuffled cartesian; the "
    "fact side is pre-aggregated before touching the grid",
)
def cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    grid = r.select("r_name", "r_regionkey").crossJoin(
        o.select(F.col("o_orderpriority").alias("pr")).distinct()
    )
    cnt = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .groupBy("n_regionkey", F.col("o_orderpriority").alias("pr"))
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        grid.join(
            cnt,
            (grid.r_regionkey == cnt.n_regionkey) & (grid.pr == cnt.pr),
            "left",
        )
        .groupBy("r_name", grid.pr.alias("pr"))
        .agg(F.coalesce(F.sum("n_orders"), F.lit(0)).alias("n_orders"))
    )


@register(
    "variance_semantics",
    """
    SELECT l_returnflag AS flag,
           round(var_pop(l_quantity), 4) AS var_p,
           round(var_samp(l_quantity), 4) AS var_s,
           round(stddev_pop(l_quantity), 4) AS sd_p,
           round(stddev_samp(l_quantity), 4) AS sd_s
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="population vs sample variance semantics, side by side: "
    "var_pop/var_samp and stddev_pop/stddev_samp per group — the "
    "n vs n-1 divisor is a classic silent cross-engine discrepancy "
    "(pandas defaults to sample, numpy to population), so the engine "
    "pins both explicitly.  Single-pass mergeable moments, one "
    "partial->final hash aggregation",
)
def variance_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.var_pop(q), 4).alias("var_p"),
        F.round(F.var_samp(q), 4).alias("var_s"),
        F.round(F.stddev_pop(q), 4).alias("sd_p"),
        F.round(F.stddev_samp(q), 4).alias("sd_s"),
    )


@register(
    "right_outer_join",
    """
    SELECT n_name,
           CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_suppliers
    FROM (SELECT s_nationkey, count(*) AS cnt
          FROM supplier GROUP BY s_nationkey) s
    RIGHT OUTER JOIN nation ON s.s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="right outer equi-join: supplier counts RIGHT JOIN nation "
    "keeps every nation, zero-filling those with no suppliers — "
    "completes the outer-join family (left in the reference's export "
    "join, full/null-safe in this batch).  Planner note: Spark "
    "canonicalizes right outer to a left outer with sides swapped, "
    "and a right outer can still broadcast its LEFT (stream) side — "
    "here both are dim-sized and the fact side is pre-aggregated",
)
def right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cnt = s.groupBy("s_nationkey").agg(F.count("*").alias("cnt"))
    return (
        cnt.join(n, cnt.s_nationkey == n.n_nationkey, "right_outer")
        .groupBy("n_name")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_suppliers"))
    )
