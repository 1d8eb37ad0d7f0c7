"""Round-8 surface extensions — consumers of the round-8 promoted paths.

- ``iqr_outlier_counts``: the classic per-group Tukey-fence outlier
  count (p25/p75 → 1.5·IQR bounds), built on the FUSED multi-quantile
  plan (``operators.stats.exact_group_quantiles``) so both fences come
  from ONE bounded-memory pass-set regardless of quantile count — the
  production shape VERDICT r7 item 5 asked the fused path to serve.
- ``dedup_cluster_representatives``: the pipeline step that actually
  FOLLOWS near-dup detection in a training-data run — for every
  near-dup component, keep one canonical document (longest text,
  tie-broken by lowest doc_id) and report the cluster size, so the
  corpus keeps one copy per cluster instead of dropping all members.
  Composes ``ngram_jaccard_pairs`` + the O(log n)
  large-star/small-star components with a per-component top-1 window.

Reference: no analog in the reference (its 9-line trans.py has no
dedup surface at all — SURVEY §0); shapes extend its GROUP-BY analysis
style over the driver corpus.  Both entries are DuckDB-oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.suite import load_table, register


@register(
    "iqr_outlier_counts",
    """
    WITH q AS (
      SELECT l_linenumber AS grp,
             quantile_cont(l_extendedprice, 0.25) AS p25,
             quantile_cont(l_extendedprice, 0.75) AS p75
      FROM lineitem GROUP BY l_linenumber)
    SELECT q.grp,
           round(q.p25, 4) AS p25,
           round(q.p75, 4) AS p75,
           CAST(count(CASE WHEN l.l_extendedprice
                                < q.p25 - 1.5 * (q.p75 - q.p25)
                             OR l.l_extendedprice
                                > q.p75 + 1.5 * (q.p75 - q.p25)
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM q JOIN lineitem l ON l.l_linenumber = q.grp
    GROUP BY q.grp, q.p25, q.p75
    """,
    doc="§7 distributed order statistics, production consumer: per-group "
    "Tukey-fence outlier counts.  Both fences (p25/p75) come from ONE "
    "fused exact_group_quantiles pass-set (stats.py:210 — stage count "
    "independent of quantile count, no per-group value buffering), the "
    "bounds attach back by broadcast (7 known groups), and the count "
    "is a conditional agg over one fact scan.  The un-rounded fence "
    "arithmetic is the same IEEE expression in both engines, so the "
    "boundary comparisons are byte-stable; only the REPORTED quantiles "
    "are rounded.  Oracle: DuckDB quantile_cont + the same fences",
)
def iqr_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.operators.stats import (
        exact_group_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    # l_linenumber: 7 known groups — assert bounded cardinality, skip
    # the broadcast-gate guard job (same contract as
    # exact_quantiles_bracket / percentile_median)
    q = exact_group_quantiles(
        li, "grp", "x", [0.25, 0.75], outs=["p25", "p75"],
        broadcast_stats=True,
    )
    iqr = F.col("p75") - F.col("p25")
    lo = F.col("p25") - F.lit(1.5) * iqr
    hi = F.col("p75") + F.lit(1.5) * iqr
    return (
        li.join(F.broadcast(q), "grp")
        .groupBy("grp", "p25", "p75")
        .agg(
            F.sum(
                F.when((F.col("x") < lo) | (F.col("x") > hi), F.lit(1))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_outliers")
        )
        .select(
            "grp",
            F.round("p25", 4).alias("p25"),
            F.round("p75", 4).alias("p75"),
            "n_outliers",
        )
    )


@register(
    "dedup_cluster_representatives",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      FROM toks),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b),
    comp AS (
      SELECT node, least(node, min(b)) AS component
      FROM (SELECT DISTINCT a AS node FROM sym) nodes
      JOIN reach ON reach.a = node
      GROUP BY node),
    sized AS (
      SELECT c.component, c.node, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.node)
    SELECT component,
           node AS rep_doc_id,
           CAST(cnt AS BIGINT) AS cluster_size
    FROM (
      SELECT component, node, n_chars,
             count(*) OVER (PARTITION BY component) AS cnt,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, node) AS rn
      FROM sized)
    WHERE rn = 1
    """,
    doc="§7 dedup, the step AFTER detection: one canonical document per "
    "near-dup component (longest n_chars, ties to the lowest doc_id) "
    "plus the cluster size — what a corpus run keeps, instead of "
    "dropping every member.  Composes ngram_jaccard_pairs (shared-"
    "shingle equi-join, dedup.py:182) with the O(log n) large-star/"
    "small-star components (dedup.py:690) and ONE per-component "
    "row_number window over the component-sized (not corpus-sized) "
    "member table.  Oracle: the recursive-CTE transitive closure + the "
    "same deterministic top-1",
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    comp = dedup.connected_components_star(pairs)
    sized = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    w = Window.partitionBy("component")
    wo = w.orderBy(F.desc("n_chars"), F.asc("node"))
    return (
        sized.withColumn("cluster_size", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("node").alias("rep_doc_id"),
            F.col("cluster_size").cast("long"),
        )
    )
