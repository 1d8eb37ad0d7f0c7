"""Round-5 surface extensions.

- ``streaming_session_window_append``: the PRODUCTION form of
  sessionization — ``withWatermark`` + append output — whose
  complete-mode twin (``round4_ops.streaming_session_window``) is
  test/bounded-drain only because it retains all state.  This entry
  demonstrates (and oracle-gates) the emit-once/evict semantics an
  unbounded stream needs.
- ``exact_median_bracket``: bounded-memory exact median
  (operators/stats.py) oracle-gated against DuckDB's.
- ``substring_dup_fraction``: exact-substring duplication signal
  (the Lee et al. 2022 "Deduplicating Training Data" exact-substring
  criterion, char-gram keyed instead of suffix-array).
- ``jsonl_ingest``: permissive JSONL source with corrupt-record
  quarantine — the ingestion format real LLM corpora arrive in.
- (``orc_roundtrip`` moved r15: consolidated into the stricter
  identity-oracle ``orc_roundtrip_identity`` in plans/surface_extra.py)

Reference: the reference has no streaming/JSON/ORC surface at all
(SURVEY §2.9/§2.1 extensions); shapes mirror its GROUP-BY analyses
re-expressed over the driver corpus.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.scratch import scratch_dir, track_persist
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

    # deliberately UNpersisted: the three bracket passes each re-scan
    # a cheap 2-column parquet projection (~0.25 s), which measured
    # FASTER than paying the 6M-row cache write up front (1.5 s vs
    # 0.9 s end-to-end) — persist pays off only when the input is an
    # expensive subtree, as in mad_outliers' deviation table
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    # l_linenumber has 7 distinct values — group cardinality is known
    # bounded, so assert it and skip the broadcast-gate guard job
    return exact_group_median(li, "grp", "x", broadcast_stats=True).select(
        "grp", F.round("med", 4).alias("med")
    )


@register(
    "exact_quantiles_bracket",
    """
    SELECT l_linenumber AS grp,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90
    FROM lineitem GROUP BY l_linenumber
    """,
    doc="§7 distributed order statistics, general form: EXACT "
    "interpolating per-group P25/P90 via "
    "operators.stats.exact_group_quantile — the arbitrary-q "
    "generalization of the bracket median (adds predecessor/successor "
    "widening because off-center target ranks can fall just outside "
    "a collapsed small-group bracket).  Oracle: DuckDB quantile_cont, "
    "the same percentile_cont semantics as Spark's F.percentile; any "
    "bracket miss or interpolation-weight error breaks the hash",
)
def exact_quantiles_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.operators.stats import (
        exact_group_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    # both quantiles from ONE fused pass-set (round-7
    # exact_group_quantiles: stage count independent of len(qs) — the
    # previous two single-q plans + join scanned the fact ~8 times);
    # 7 known groups (l_linenumber): assert bounded cardinality, skip
    # the broadcast-gate guard job
    qq = exact_group_quantiles(
        li, "grp", "x", [0.25, 0.90], outs=["p25", "p90"], broadcast_stats=True
    )
    return qq.select(
        "grp",
        F.round("p25", 4).alias("p25"),
        F.round("p90", 4).alias("p90"),
    )


# shared by the raw-key and hashed-key registrations: the gram key only
# decides gram EQUALITY, and xxhash64 equality == string equality up to
# a ~1e-19·n² collision, so both forms produce identical output and the
# same DuckDB oracle gates both.
_SSDF_ORACLE = """
    WITH pos AS (
      SELECT doc_id, i, substr(text, CAST(i AS INT), 20) AS g
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 19)) AS i
            FROM documents WHERE length(text) >= 20)),
    dup AS (SELECT g FROM pos GROUP BY g HAVING count(*) > 1),
    dp AS (SELECT p.doc_id, p.i FROM pos p JOIN dup USING (g)),
    cov AS (
      SELECT doc_id,
             least(20, coalesce(lead(i) OVER (PARTITION BY doc_id
                                              ORDER BY i),
                                i + 20) - i) AS c
      FROM dp),
    agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_chars FROM cov GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(agg.dup_chars, 0) AS BIGINT) AS dup_chars,
           length(d.text) AS n_chars,
           round(coalesce(agg.dup_chars, 0) / greatest(length(d.text), 1),
                 6) AS dup_fraction
    FROM documents d LEFT JOIN agg USING (doc_id)
    """


@register(
    "substring_dup_fraction",
    _SSDF_ORACLE,
    doc="§7 exact-substring duplication signal (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better'): the "
    "fraction of each document's characters covered by a 20-char gram "
    "that occurs more than once in the corpus (including within-doc "
    "repeats).  Suffix arrays don't distribute; the equivalent "
    "char-gram formulation does: explode positions, one hash-agg for "
    "gram frequency, join back the duplicated grams, and merge "
    "overlapping [i, i+20) intervals per doc with a lead() window "
    "(coverage = Σ min(20, next_i - i)).  At 100 TB the gram key is "
    "a 64-bit hash instead of the raw 20-char string (same algebra, "
    "8× narrower shuffle; raw strings here keep the DuckDB oracle "
    "hash-function-agnostic), and the frequency table is df-capped "
    "like the shingle joins.  Every stage is a hash agg / equi-join / "
    "narrow window — no suffix structure, no all-pairs",
)
def substring_dup_fraction(
    spark: SparkSession, sf_dir: str, key_hash: bool = False
) -> DataFrame:
    """``key_hash=True`` is the PRODUCTION form: the gram key becomes
    ``xxhash64(gram)`` — an 8-byte shuffle key instead of a 20-char
    string (~8× narrower frequency shuffle and join-back; a 64-bit
    collision merging two distinct grams is ~1e-19·n² and only ever
    OVERcounts coverage by one gram).  The oracle-gated entry keeps
    the raw string so the DuckDB twin needs no matching hash
    function; the scaling harness measures both forms."""
    from nyc_taxi_data_clickhouse_spark.partitioning import widen_for_cpu_map

    k = 20
    # the per-char position explode multiplies rows ~1000x BEFORE the
    # first exchange: from a single-row-group scan that whole expansion
    # (and the persist populating it) runs on one core — widen when
    # starved, no-op on naturally partitioned inputs
    docs = widen_for_cpu_map(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    gram = F.expr(f"substr(text, i, {k})")
    # persist the exploded position table: the gram-frequency agg AND
    # the join-back both consume it (VERDICT r3 #4 recompute rule).
    # track_persist bounds the cache to one live copy across repeated
    # calls (the lazily-consumed result forbids in-body unpersist).
    pos = track_persist(
        f"ssdf_pos_{key_hash}_{Path(sf_dir).name}",
        docs.filter(F.length("text") >= k).select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (k - 1))
            ).alias("i"),
            (F.xxhash64(gram) if key_hash else gram).alias("g"),
        ),
    )
    dup = pos.groupBy("g").agg(F.count("*").alias("__n")).filter(
        F.col("__n") > 1
    )
    dp = pos.join(dup.select("g"), "g").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    cov = dp.select(
        "doc_id",
        F.least(
            F.lit(k),
            F.coalesce(F.lead("i").over(w), F.col("i") + k) - F.col("i"),
        ).alias("c"),
    )
    agg = cov.groupBy("doc_id").agg(F.sum("c").alias("dup_chars"))
    return (
        docs.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            F.length("text").alias("n_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0))
                / F.greatest(F.length("text"), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


@register(
    "substring_dup_fraction_hashed",
    _SSDF_ORACLE,
    doc="PRODUCTION form of substring_dup_fraction (VERDICT r6 item 6): "
    "gram key = xxhash64(gram), an 8-byte shuffle key instead of a "
    "20-char string — ~8× narrower frequency shuffle and join-back, "
    "0.66 marginal scaling slope vs 1.15 for the raw form "
    "(SCALING_r05.json).  Output is identical to the raw form (the key "
    "only decides gram equality; a 64-bit collision is ~1e-19·n² and "
    "only ever overcounts one gram), so the SAME DuckDB oracle gates "
    "it.  This is the form the headline bench times; the raw entry "
    "stays as the hash-agnostic twin",
)
def substring_dup_fraction_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_dup_fraction(spark, sf_dir, key_hash=True)


@register(
    "jsonl_ingest",
    """
    SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="§2.1 extension source: permissive JSONL ingestion — the "
    "format real LLM corpora arrive in (the reference ingests only "
    "gzipped CSV).  The entry stages the documents table as JSON "
    "lines, appends a malformed line, and reads it back with an "
    "explicit schema in PERMISSIVE mode: bad records land in "
    "_corrupt_record instead of failing the job or silently skewing "
    "aggregates, and are quarantined by one filter.  Oracle: the "
    "same per-lang rollup over the clean table — a surviving corrupt "
    "row or a dropped good row breaks count and sum.  At 100 TB the "
    "stage-out disappears (data already lands as JSONL); schema-on-"
    "read with explicit types avoids the double-pass inference scan",
)
def jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = load_table(spark, sf_dir, "documents")
    # atexit-reaped scratch dir — repeated suite/bench runs leave /tmp
    # flat (VERDICT r6 item 4)
    stage = scratch_dir("jsonl_")
    docs.write.mode("overwrite").json(stage)
    with open(os.path.join(stage, "zz_corrupt.json"), "w") as f:
        f.write('{"doc_id": 999999999, "text": "unclosed\n')
        f.write("not json at all\n")
    schema = (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT, _corrupt_record STRING"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(stage)
    )
    clean = raw.filter(F.col("_corrupt_record").isNull())
    return clean.groupBy("lang").agg(
        F.count("*").alias("cnt"),
        F.sum("n_chars").alias("total_chars"),
    )


# NOTE (r15, VERDICT r14 item 3): the ``orc_roundtrip`` aggregate
# entry that lived here was consolidated into the stricter
# identity-oracle ``orc_roundtrip_identity`` (plans/surface_extra.py)
# — the same sink/source path held two registry slots; the identity
# form pins every row/column of the format conversion rather than an
# aggregate over it.  Freed slot recorded in COVERAGE.md.
