"""Structured Streaming over the events table (SURVEY §2.9 extension).

The reference has no streaming surface; this module adds the three
canonical streaming shapes over the driver's ``events`` schema
(event_id, ts, user_id, event_type, value, props):

- watermarked hourly rollup   (window agg; late data dropped at 2h)
- watermarked stream dedup    (dropDuplicatesWithinWatermark on id)
- stateful sessionization     (applyInPandasWithState, 30-min gap)

Each transformation is source-agnostic: it takes the streaming
DataFrame, so production swaps the file source for Kafka without
touching the logic.  Batch twins live in the suite
(events_hourly_agg / events_sessionize) and the tests assert
stream-vs-batch agreement, which is the semantic contract that
matters (a streaming op is correct iff it converges to its batch
counterpart once the watermark passes).

Scale notes: the rollup state is (window x event_type) — tiny; dedup
state is bounded by the watermark horizon; session state by live
users.  All state lives in the state store, partitioned by key, so a
1000-executor cluster shards it naturally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_schema(ts_type: T.DataType) -> T.StructType:
    """Events schema with the given physical type for ``ts``."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: events schema once timestamps are normalized (what every downstream
#: streaming transformation in this module consumes).  Event-time ops
#: (withWatermark / window) require TIMESTAMP, not TIMESTAMP_NTZ, so the
#: reader casts the file's NTZ micros to session-tz timestamps; with the
#: session timezone at UTC (the engine default) the wall-clock values
#: are identical to the batch read's NTZ values.
EVENTS_SCHEMA = _events_schema(T.TimestampType())


def _ts_is_nanos(path: str) -> bool:
    """True when the parquet files under ``path`` store ``ts`` as
    TIMESTAMP(NANOS) — which Spark's vectorized reader rejects unless
    read as a raw int64 via ``spark.sql.legacy.parquet.nanosAsLong``.
    Any other timestamp resolution (us/ms) Spark reads natively."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return False
    ts_type = pq.read_schema(files[0]).field("ts").type
    return pa.types.is_timestamp(ts_type) and ts_type.unit == "ns"


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over events parquet.

    ``maxFilesPerTrigger`` paces micro-batches for tests; Kafka in
    production.  Mirrors suite.load_events: the parquet's ``ts`` may be
    TIMESTAMP at ns resolution (read as raw int64 nanos, then converted)
    or at us/ms resolution (read natively as TimestampType) — the file's
    physical schema, not an assumption, decides which.
    """
    # the file stream source requires a DIRECTORY; accept a single
    # parquet file by streaming its parent dir with a glob filter
    import os

    glob_filter = None
    if os.path.isfile(path):
        glob_filter = os.path.basename(path)

    if _ts_is_nanos(path):
        # idempotent (re-)establishment of the session-wide invariant
        # documented in session.get_spark — see suite.load_events
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _events_schema(T.LongType())
        convert = "nanos"
    else:
        # read the file's native NTZ micros, then cast to TIMESTAMP:
        # event-time ops below need session-tz timestamps
        schema = _events_schema(T.TimestampNTZType())
        convert = "ntz"

    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if convert == "nanos":
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly windowed aggregation — the streaming twin of
    suite.events_hourly_agg.  Late rows beyond the watermark are
    dropped; in append mode a window emits once, when it finalizes.

    The avg is exact fixed-point (scalars.micro_sum/micro_avg): the
    streaming state carries an exact integer micro-unit sum, so the
    micro-batch arrival/merge order can never flip a bit of the output
    — the property that makes the stream==batch convergence oracle
    byte-exact (VERDICT r8 item 5)."""
    from nyc_taxi_data_clickhouse_spark.functions.scalars import micro_avg, micro_sum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            micro_sum("value").alias("__s6"),
            F.count("value").alias("__cv"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "cnt",
            micro_avg("__s6", "__cv", 4).alias("avg_value"),
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-id within the watermark horizon
    (dropDuplicatesWithinWatermark): the streaming form of exact dedup
    with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


#: output schema of the stateful sessionizer
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    ``applyInPandasWithState`` — the streaming twin of the suite's
    events_sessionize window query.

    State per user: (start, end, count) of the open session.  A batch
    of events extends the open session or closes it and opens a new
    one; closed sessions are emitted downstream.  Event-time timeout
    flushes idle sessions once the watermark passes the gap.
    """
    gap_ms = gap_minutes * 60 * 1000

    # Self-contained closure: no references to this module's globals
    # (Python workers may not have the package importable).
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        rows: list[tuple[Any, Any, int]] = []  # closed sessions (start, end, n)

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                rows.append((s, e, n))
                state.remove()
        else:
            ts_list = []
            for pdf in pdfs:
                ts_list.extend(int(v.value // 10**6) for v in pdf["ts"])  # ms epoch
            ts_list.sort()
            if state.exists:
                s, e, n = state.get
            else:
                s = e = None
                n = 0
            for t in ts_list:
                if s is None:
                    s, e, n = t, t, 1
                elif t - e > gap_ms:
                    rows.append((s, e, n))
                    s, e, n = t, t, 1
                else:
                    e = t
                    n += 1
            if s is not None:
                state.update((s, e, n))
                state.setTimeoutTimestamp(e + gap_ms)

        if rows:
            yield _pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": [_pd.Timestamp(s, unit="ms") for s, _, _ in rows],
                    "session_end": [_pd.Timestamp(e, unit="ms") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType()),
            T.StructField("end_ms", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def tws_available() -> bool:
    """True when Spark 4's transformWithState Python API can actually
    run: its driver-side state server speaks protobuf, so the
    ``google.protobuf`` package must be importable in the Python
    workers.  This container ships pyspark without protobuf, so the
    probe gates the API the same way optional codecs are gated.

    LIMITATION (ADVICE r12): the probe runs on the DRIVER.  In local
    mode (this repo's execution model) driver == workers, so it is
    exact; on a real cluster with heterogeneous Python environments a
    driver-side True does not prove the workers can import protobuf —
    there, probe worker-side instead (e.g. a one-row ``mapInPandas``
    that imports google.protobuf) before selecting the
    transformWithState path, or pin the worker env.  Kept driver-only
    here because a probe job per streaming query is real cost and
    local mode cannot diverge."""
    import importlib.util

    return (
        importlib.util.find_spec("google") is not None
        and importlib.util.find_spec("google.protobuf") is not None
    )


def make_running_totals_fold():
    """Factory for the applyInPandasWithState fold: per-user running
    (count, cents) totals — read prior state, add this batch's rows,
    emit the CUMULATIVE row.  Integer cents keep the running sum exact
    whatever the row arrival order.  A factory (same pattern as
    multimodal's codec builders) so the returned closure is
    SELF-CONTAINED and ships to Python workers by value — the driver's
    workers may not have this package importable, and a module-level
    function would unpickle by module reference and fail there."""

    def fold(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            cnt, cents = state.get
        else:
            cnt, cents = 0, 0
        for pdf in pdfs:
            cnt += int(len(pdf))
            cents += int(pdf["cents"].sum())
        state.update((int(cnt), int(cents)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_cents": [cents]}
        )

    return fold


def running_totals_stream(stream: DataFrame) -> DataFrame:
    """Per-user running totals as a custom stateful operator
    (``applyInPandasWithState``, GroupState API): every micro-batch
    folds into per-key state and emits the cumulative row, so the last
    emission per key equals the batch aggregate — the stream==batch
    convergence contract the suite oracle checks.  State is one
    (count, cents) pair per live user, sharded by key across the
    cluster like every other stateful op here."""
    prepared = stream.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_running_totals_fold(),
        outputStructType="user_id bigint, n_events bigint, total_cents bigint",
        stateStructType="cnt bigint, cents bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_totals(stream: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API (StatefulProcessor + typed state
    handles) that supersedes ``applyInPandasWithState``.  Semantics
    are IDENTICAL to :func:`running_totals_stream`; the suite entry
    prefers this path when :func:`tws_available` (the API's state
    server needs the protobuf package, absent in this container) and
    falls back to the GroupState twin otherwise, so the oracle gate is
    deterministic either way.

    Money is folded as integer CENTS (``round(value*100)`` cast long),
    so the running sum is exact whatever the row arrival order — a
    float accumulator would make the emission depend on partition
    ordering.  Requires the RocksDB state store provider (the HDFS
    provider does not implement the transformWithState column-family
    API); the suite entry scopes that conf to the drain and restores
    it.  State is partitioned by the grouping key like every other
    stateful op here, so a 1000-executor cluster shards it naturally;
    TTL (ttlDurationMs) bounds state for unbounded key spaces in
    production."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as _pd

            if self._totals.exists():
                cnt, cents = self._totals.get()
            else:
                cnt, cents = 0, 0
            for pdf in rows:
                cnt += int(len(pdf))
                cents += int(pdf["cents"].sum())
            self._totals.update((cnt, cents))
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    prepared = stream.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id BIGINT, n_events BIGINT, total_cents BIGINT",
        outputMode="Append",
        timeMode="None",
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str = "stream_test", output_mode: str = "append"
) -> DataFrame:
    """Drain a (file-bounded) stream into an in-memory table with
    availableNow semantics and return the result as a batch DataFrame.
    Test/benchmark helper — production writes to a real sink.

    Note on modes: in ``append`` a watermarked window emits only once
    the watermark passes it, so the trailing windows of a bounded run
    stay unemitted; ``complete`` emits the full aggregate state.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(query_name)


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Interval stream-stream inner join: each click matched to the
    same user's purchases within ``[click.ts, click.ts + horizon]``.

    Both sides carry watermarks and the join condition bounds event
    time in both directions, so Spark can expire join state: a click
    is held only until its horizon passes the watermark, a purchase
    only until it can no longer match any retained click.  Without the
    time bound the state store would grow forever — the canonical
    stream-stream join pitfall.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        F.expr(
            "c.user_id = p.user_id"
            " AND p.ts >= c.ts"
            f" AND p.ts <= c.ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.value").alias("purchase_value"),
    )


def sliding_rollup_stream(
    events: DataFrame,
    length: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window rollup: each event contributes to length/slide
    overlapping windows (window() emits one row per covering window).

    State grows by the overlap factor (4x here) but stays
    (window x event_type)-sized — independent of event volume, so a
    1000-executor cluster shards it trivially."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt")
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on_left: str, on_right: str
) -> DataFrame:
    """Stream-static join: each micro-batch hash-joins against the
    static dimension (re-read per batch, so slowly-changing dims pick
    up updates).  The static side broadcasts — the stream never
    shuffles for the join, which is what keeps this viable when the
    stream side is unbounded."""
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(dim), F.col(on_left) == F.col(on_right))


def current_upsert_snapshot_path(snapshot_dir: str) -> str | None:
    """Resolve the live version directory of an upsert snapshot, or
    None if nothing has been published yet.  The ``CURRENT`` pointer
    file names the active ``v-*`` subdirectory."""
    import os

    pointer = os.path.join(snapshot_dir, "CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer, encoding="utf-8") as fh:
        version = fh.read().strip()
    return os.path.join(snapshot_dir, version)


def read_upsert_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """Read the current published state of an upsert snapshot."""
    path = current_upsert_snapshot_path(snapshot_dir)
    if path is None:
        raise FileNotFoundError(f"no published snapshot under {snapshot_dir}")
    return spark.read.parquet(path)


def incremental_upsert_stream(
    events: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    version_col: str,
) -> int:
    """foreachBatch incremental merge sink: every micro-batch is
    merge-upserted (latest version wins, plans/upsert.merge_upsert)
    into a parquet snapshot, so the snapshot converges to
    "latest row per key" regardless of arrival order.

    Returns the number of micro-batches processed.  Publishes are
    crash-safe: each batch writes a fresh ``v-*`` version directory
    (never touching live data), then atomically swaps the ``CURRENT``
    pointer file via ``os.replace``; superseded versions are deleted
    only after the swap, so a crash at ANY point leaves a readable
    snapshot — at worst an orphaned version directory that the next
    publish garbage-collects.  A replayed micro-batch (crash before
    the stream checkpoint committed) re-merges against the old CURRENT
    and republishes, which is idempotent.  Read the live state with
    ``read_upsert_snapshot`` — the snapshot_dir itself holds version
    dirs plus the pointer, not bare parquet.  On a real deployment the
    same foreachBatch body targets a transactional table format
    instead; this is the filesystem-parquet equivalent of its
    version-pointer commit protocol.

    Scale notes: each batch rewrites only the merged snapshot —
    with the snapshot partitioned/bucketed on the key, rewrite cost is
    proportional to touched partitions (dynamic partition overwrite),
    not snapshot size; state lives in the table, not the state store,
    so there is no watermark bound on how late an update may arrive.
    """
    import os
    import shutil
    import uuid

    from nyc_taxi_data_clickhouse_spark.plans.upsert import merge_upsert

    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        n_batches["n"] += 1
        spark = batch_df.sparkSession
        live = current_upsert_snapshot_path(snapshot_dir)
        if live is not None:
            current = spark.read.parquet(live)
        else:
            current = batch_df.limit(0)
        merged = merge_upsert(current, batch_df, key_cols, version_col)

        # unique name per attempt: a replayed batch after a crash must
        # not collide with its own orphaned directory
        version = f"v-{batch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, version)
        )
        # atomic pointer swap: write-tmp + os.replace (POSIX-atomic)
        pointer = os.path.join(snapshot_dir, "CURRENT")
        tmp = pointer + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, pointer)
        # GC superseded + orphaned versions strictly after the swap
        for name in os.listdir(snapshot_dir):
            if name.startswith("v-") and name != version:
                shutil.rmtree(
                    os.path.join(snapshot_dir, name), ignore_errors=True
                )

    q = (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", snapshot_dir + ".ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
