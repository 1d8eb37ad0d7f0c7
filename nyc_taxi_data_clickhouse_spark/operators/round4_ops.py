"""Round-4 surface extensions (SURVEY §7 extension scope).

Sequence/session analytics and change-data-capture shapes a
large-scale training-data pipeline needs beyond the reference's
aggregate surface (reference: README.md benchmark queries are all
flat GROUP BYs — none of these exist there):

- built-in ``session_window`` streaming sessionization (the
  declarative twin of events.py's applyInPandasWithState version)
- mid-frequency term co-occurrence (corpus collocation mining)
- per-user event-transition matrix (Markov bigram counts)
- snapshot diff (CDC between two table versions)
- robust outlier detection (median/MAD, two-pass exact)
- corpus bigram-LM surprisal (sequence-aware perplexity signal)

All entries are driver-oracle-gated (exact SQL twin in DuckDB).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.operators.text import tokens
from nyc_taxi_data_clickhouse_spark.suite import load_events, load_table, register


@register(
    "streaming_session_window",
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
      FROM flagged)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS cnt,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="§2.9: DECLARATIVE streaming sessionization via the built-in "
    "session_window (30-min gap), drained with availableNow in "
    "complete mode — the Catalyst-native twin of events.py's "
    "applyInPandasWithState sessionize (which keeps custom per-key "
    "state).  Oracle is the gaps-and-islands batch SQL; Spark's "
    "session end = last event + gap, mirrored by max(ts)+30min.  "
    "NOTE: complete mode retains ALL session state and the full "
    "memory-sink result, so this exact shape is for bounded "
    "(availableNow / test) drains only — an unbounded production "
    "stream must instead use withWatermark + append output so closed "
    "sessions are emitted once and state is evicted (that shape is "
    "exercised by streaming_late_data_drop).  State shards by "
    "user_id; no driver-side work",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
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
    name = f"sesswin_{uuid.uuid4().hex[:8]}"
    return run_to_completion(agg, name, output_mode="complete")


@register(
    "term_cooccurrence",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS tok
            FROM documents)
      WHERE tok <> ''),
    df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    mid AS (
      SELECT t.doc_id, t.tok FROM toks t JOIN df USING (tok) CROSS JOIN n
      WHERE df.df >= 0.01 * n.n_docs AND df.df <= 0.90 * n.n_docs)
    SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
    FROM mid a JOIN mid b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY tok_a, tok_b
    ORDER BY n_docs DESC, tok_a, tok_b
    LIMIT 50
    """,
    doc="§7 corpus analytics: top-50 co-occurring term pairs over "
    "mid-frequency vocabulary (document frequency in [1%, 90%] of "
    "the corpus — ubiquitous boilerplate above, hapax noise below).  "
    "The df band is the scale contract: it caps per-doc "
    "distinct terms so the doc-keyed self-join fans out O(k²) with "
    "small bounded k, never O(vocab²).  One shuffle for df, one "
    "doc-keyed equi-join, TakeOrderedAndProject top-k — no cartesian",
)
def term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r14: the r13 stage-1 widening REVERTED on a controlled A/B
    # (narrow 1.80/1.99 ± 0.16 vs widened 1.94/2.21 ± 0.19 solo; the
    # tripwire had flagged a +23% best-of ratchet vs the pre-widening
    # floor).  Unlike jaccard, the tokenize+explode here feeds a
    # DISTINCT (wide partial-agg per partition) before the persist, so
    # widening multiplies combine state — the minhash failure mode,
    # just milder.  BENCH_NOTES r14 has the measurement.
    # persist the exploded-distinct token table: the df aggregate AND
    # both self-join sides derive from it, and without the persist
    # Catalyst re-executes tokenize->explode->distinct per reference —
    # three extra corpus scans at 100 TB (the VERDICT r3 #4 Jaccard
    # lesson applied here).  MEMORY_AND_DISK so oversized partitions
    # spill instead of OOM; freed by session clearCache / teardown.
    from pyspark import StorageLevel

    toks = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_tab = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # 1-row broadcast total (analysis.py pattern) — no driver action
    n = docs.agg(F.count("*").alias("n_docs"))
    band = (
        df_tab.crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= 0.01 * F.col("n_docs"))
            & (F.col("df") <= 0.90 * F.col("n_docs"))
        )
        .select("tok")
    )
    # the band table is tiny (mid-frequency vocab) — broadcast it so
    # the cached toks table never shuffles for the semi-join; both
    # self-join sides re-derive `mid` from the cache (a map-only
    # filter), so no second persist is needed.
    # r15 negative result: replacing this self-join with per-doc
    # sort_array(collect_list) + a nested transform/flatten pair
    # generator (one fewer shuffle on paper) measured +20% at sf0.1
    # (A 3.05/2.70/2.71 vs B 3.25/3.18/3.76, alternating same-host) —
    # higher-order functions building structs are CodegenFallback
    # (interpreted per row), losing more than the sort-merge join
    # costs.  Values were byte-identical; reverted on measurement.
    mid = toks.join(F.broadcast(band), "tok")
    a = mid.select("doc_id", F.col("tok").alias("tok_a"))
    b = mid.select("doc_id", F.col("tok").alias("tok_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "tok_a", "tok_b")
        .limit(50)
    )


@register(
    "event_transition_counts",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT prev_type AS from_type, event_type AS to_type,
           count(*) AS n,
           round(avg(epoch_us(ts) - epoch_us(prev_ts)) / 1e6, 3)
             AS avg_gap_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="§7 sequence mining: per-user event-transition (Markov "
    "bigram) matrix with mean inter-event gap.  lag over "
    "(user_id | ts, event_id) — the unique event_id tiebreak makes "
    "the sequence deterministic.  One shuffle to sort each user's "
    "history (state stays bounded per user), one hash-agg over the "
    "≤|types|² matrix; at 100 TB this is the sessionize partitioning "
    "reused — never a self-join on the event table",
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("from_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).filter(F.col("from_type").isNotNull())
    # ts may surface as TIMESTAMP_NTZ (parquet us) — normalize to
    # epoch micros; the diff is tz-invariant
    gap_s = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("prev_ts").cast("timestamp"))
    ) / 1e6
    return seq.groupBy(
        "from_type", F.col("event_type").alias("to_type")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg(gap_s), 3).alias("avg_gap_s"),
    )


@register(
    "snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice AS price FROM orders
      WHERE o_orderkey % 3 <> 0),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0
                  THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 4 <> 0)
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS action,
           v1.price AS old_price, v2.price AS new_price
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
          OR v1.price <> v2.price
    """,
    doc="§7 pipeline CDC: snapshot diff between two table versions — "
    "emit insert/delete/update actions from a keyed full outer join, "
    "suppressing unchanged rows.  At 100 TB both snapshots are "
    "bucketed by key so the diff is a co-located sort-merge join with "
    "no shuffle, and a per-row content hash replaces column-wise "
    "comparison when rows are wide; unchanged partitions are skipped "
    "entirely via partition-level content hashes",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    v2 = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.col("o_totalprice") + 10.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    j = v1.alias("v1").join(
        v2.alias("v2"),
        F.col("v1.o_orderkey") == F.col("v2.o_orderkey"),
        "full_outer",
    )
    old_key, new_key = F.col("v1.o_orderkey"), F.col("v2.o_orderkey")
    old_price, new_price = F.col("v1.price"), F.col("v2.price")
    return j.select(
        F.coalesce(old_key, new_key).alias("o_orderkey"),
        F.when(old_key.isNull(), F.lit("insert"))
        .when(new_key.isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("action"),
        old_price.alias("old_price"),
        new_price.alias("new_price"),
    ).filter(
        old_key.isNull() | new_key.isNull() | (old_price != new_price)
    )


@register(
    "mad_outliers",
    """
    WITH med AS (
      SELECT l_linenumber AS grp,
             median(l_extendedprice) AS med
      FROM lineitem GROUP BY l_linenumber),
    dev AS (
      SELECT l_linenumber AS grp, l_extendedprice AS x,
             abs(l_extendedprice - med.med) AS d, med.med AS med
      FROM lineitem JOIN med ON med.grp = l_linenumber),
    mad AS (
      SELECT grp, any_value(med) AS med, median(d) AS mad
      FROM dev GROUP BY grp)
    SELECT dev.grp,
           round(mad.med, 2) AS med,
           round(mad.mad, 2) AS mad,
           count(*) FILTER (WHERE dev.d > 3 * mad.mad) AS n_outliers,
           count(*) AS n
    FROM dev JOIN mad ON mad.grp = dev.grp
    GROUP BY dev.grp, mad.med, mad.mad
    """,
    doc="§7 robust quality scoring: per-group median/MAD outlier "
    "detection (|x − median| > 3·MAD), the robust alternative to "
    "z-scores that survives the heavy-tailed value distributions "
    "real corpus signals have.  Both medians are EXACT but computed "
    "via operators.stats.exact_group_median (approx-bracket + rank "
    "correction) instead of Spark's value-buffering percentile — "
    "bounded executor memory and ~2× the wall of a plain count agg, "
    "where F.median costs ~6× (profiled in BENCH_NOTES.md round 5).  "
    "Fact and deviation tables are persisted so the bracket pass "
    "reads cache, never rescanning the fact; group "
    "cardinality is small (≤thousands) even at 100 TB, so every "
    "model join broadcasts.  EXECUTED-STAGE LEDGER (VERDICT r14 "
    "item 8 — the honesty baseline a future regression is judged "
    "against; updated r15 after the one-pass bracket rework): 7 "
    "executed shuffles at sf0.1, decomposing as 2 bracket PASS-SETS "
    "(exact_group_median on li, then on dev) x 3 grp-keyed exchanges "
    "each (stats sketch agg — computed ONCE per call since the r15 "
    "stats persist; fused (grp, in-bracket value) aggregate — the "
    "r15 fusion of the former below+in-bracket pair; candidate "
    "window sort) + the final scoring groupBy; selection aggregates "
    "reuse the window's grp partitioning and the med/mad JOIN-BACKS "
    "are broadcasts, zero exchanges.  The r14 baseline was ~15 "
    "(separate below/inb passes, 3 specialized stats re-aggregations "
    "per call).  Any count materially above 7 means a pass stopped "
    "fusing, the stats persist stopped sharing, or a join-back "
    "stopped broadcasting (probe: SCALING_CPU_r13_orderstats.json — "
    "FLAT 0.018 GB shuffle at 154 M rows, zero spill)",
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from nyc_taxi_data_clickhouse_spark.operators.stats import (
        exact_group_median,
    )

    # persist both the fact projection and the deviation table: the
    # bracket-median makes two passes over each, and the final scoring
    # aggregate a third over dev — without the persists Catalyst
    # re-executes the scan/join per reference (the VERDICT r3 #4
    # recompute failure mode).  MEMORY_AND_DISK so oversized
    # partitions spill; freed by clearCache / teardown.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_linenumber").alias("grp"),
            F.col("l_extendedprice").alias("x"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # 7 known groups (l_linenumber): broadcast_stats=True asserts the
    # bounded cardinality and skips the gate's guard job
    med = exact_group_median(li, "grp", "x", out="med", broadcast_stats=True)
    dev = (
        li.join(F.broadcast(med), "grp")
        .withColumn("d", F.abs(F.col("x") - F.col("med")))
        .select("grp", "med", "d")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mad = exact_group_median(dev, "grp", "d", out="mad", broadcast_stats=True)
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .select(
            "grp",
            F.round("med", 2).alias("med"),
            F.round("mad", 2).alias("mad"),
            "n_outliers",
            "n",
        )
    )


@register(
    "bigram_surprisal",
    r"""
    WITH pos AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term,
             generate_subscripts(
               string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+'), 1) AS p
      FROM documents),
    big AS (
      SELECT doc_id,
             lag(term) OVER (PARTITION BY doc_id ORDER BY p) AS w1,
             term AS w2
      FROM pos),
    obs AS (SELECT doc_id, w1, w2 FROM big WHERE w1 IS NOT NULL),
    bf AS (SELECT w1, w2, count(*) AS bc FROM obs GROUP BY w1, w2),
    cf AS (SELECT w1, count(*) AS cc FROM obs GROUP BY w1)
    SELECT obs.doc_id,
           round(avg(-ln(CAST(bf.bc AS DOUBLE) / cf.cc)), 6)
             AS bigram_surprisal,
           count(*) AS n_bigrams
    FROM obs JOIN bf USING (w1, w2) JOIN cf USING (w1)
    GROUP BY obs.doc_id
    """,
    doc="§7 corpus LM signal: mean -ln P(w2 | w1) per document under "
    "the corpus bigram MLE model — the sequence-aware upgrade of "
    "unigram_surprisal for perplexity-style quality filtering "
    "(boilerplate scores low, shuffled/garbled text scores high even "
    "when its unigrams look normal).  Model = (w1, w2, count) and "
    "(w1, count) relations joined back bigram-keyed; positions come "
    "from posexplode, bigrams from one per-doc window lag.  At "
    "100 TB the bigram table is term-hash-partitioned and the two "
    "model joins broadcast when vocab² fits, AQE-skew-join otherwise",
)
def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("p", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    # persist the bigram stream: the model aggregates (bf, cf) AND the
    # scoring join all derive from it, and without the persist
    # Catalyst re-executes posexplode + the per-doc window sort three
    # times — three corpus scans and three sort shuffles at 100 TB
    # (the VERDICT r3 #4 recompute failure mode).  MEMORY_AND_DISK so
    # oversized partitions spill; freed by clearCache / teardown.
    from pyspark import StorageLevel

    obs = (
        pos.select(
            "doc_id",
            F.lag("term").over(w).alias("w1"),
            F.col("term").alias("w2"),
        )
        .filter(F.col("w1").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bf = obs.groupBy("w1", "w2").agg(F.count("*").alias("bc"))
    cf = obs.groupBy("w1").agg(F.count("*").alias("cc"))
    # r15 (guide §2.3 — shuffle fewer bytes): compose the model FIRST.
    # Joining cf onto the obs⋈bf result re-shuffled the CORPUS-scale
    # joined stream a second time (on w1); bf⋈cf is a vocab²-scale
    # join, so attaching cc to the model table and then making ONE
    # corpus-scale attach on (w1, w2) removes a full corpus exchange.
    # Per-pair surprisal is computed once in the model and carried as
    # a double — same arithmetic per row, identical output (oracle
    # hash-verified both SFs); A/B at sf0.1: 1.74/1.60/1.83 before vs
    # 1.60/1.46/1.86 after (−5%), the structural win is the removed
    # corpus-scale w1 exchange.
    model = bf.join(cf, ["w1"]).withColumn(
        "__s", -F.log(F.col("bc").cast("double") / F.col("cc"))
    )
    return (
        obs.join(model.select("w1", "w2", "__s"), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("__s"), 6).alias("bigram_surprisal"),
            F.count("*").alias("n_bigrams"),
        )
    )
