"""Data-sized shuffle partitioning for the heavy self-join operators
(VERDICT r8 item 1).

Spark's ``spark.sql.shuffle.partitions`` is a SESSION constant, sized to
the core count for the interactive/benchmark floor.  That is the right
default for the suite's hundreds of small exchanges — the r8 A/B probe
showed that globally raising it (via AQE ``initialPartitionNum``)
regresses the whole sf0.1 headline 1.2–2.3× because the task-scheduling
floor is not refunded at small shuffle sizes.  But a FIXED count is the
wrong unit for the one shape whose per-task state grows with the data:
the shingle self-join inside n-gram Jaccard sorted 2.2 GB per task at
the x256 decade (70.4 GB total spill, CPU marginal slope 1.72); re-running
with 512 partitions removed the spill growth and cut CPU 26 %
(SCALING_CPU_r08_jaccard.json, BENCH_NOTES round 8).

The per-operator control implemented here: estimate the operator's
INPUT bytes from the optimized plan's statistics (file sizes for
parquet scans — no job, no collect), multiply by the operator's
measured expansion factor into shuffle/sort bytes, and insert an
explicit ``repartition(n, key)`` ONLY when the derived n exceeds the
session default.  Because the repartition keys are the join/group keys,
the downstream join and aggregation reuse the exchange — the sized
shuffle REPLACES the default-sized one rather than adding a stage.
Below the threshold the plan is byte-identical to before, so the
small-SF benchmark floor (and every oracle plan) is untouched.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

#: per-partition budget for sort/join state.  128 MB of in-sort rows
#: per task keeps the external sorter in memory at executor defaults
#: (spark.sql.files.maxPartitionBytes uses the same unit for scans).
TARGET_PARTITION_BYTES = 128 * 1024 * 1024

#: hard cap — beyond this, per-task data is small enough that the
#: scheduling floor dominates again; 4096 matches the largest sensible
#: single-app shuffle width on a ~1000-executor cluster's AQE ceiling.
MAX_SIZED_PARTITIONS = 4096


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (bytes), or None when the
    estimator has no real number (the unknown sentinel is defaultSize =
    Long.MaxValue-ish; anything that absurd is treated as unknown).
    For a parquet/CSV scan this is the actual file byte count — exactly
    the unit the expansion factors below were calibrated against."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))
    except Exception:
        return None
    if size <= 0 or size >= 1 << 60:
        return None
    return size


def sized_shuffle_partitions(
    df: DataFrame,
    expansion: float,
    target_bytes: int = TARGET_PARTITION_BYTES,
    cap: int = MAX_SIZED_PARTITIONS,
) -> int | None:
    """Partition count for a heavy exchange over data derived from
    ``df``, or None when the session default already suffices (the
    common small-input case — returning None keeps the plan identical
    to the un-sized one).

    ``expansion``: measured ratio of the operator's shuffle/sort bytes
    to the INPUT's plan-size bytes (each operator documents its own
    calibration at the call site)."""
    size = plan_size_bytes(df)
    if size is None:
        return None
    spark = df.sparkSession
    try:
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        default = 200
    n = math.ceil(size * expansion / target_bytes)
    if n <= default:
        return None
    return min(cap, n)


def sized_partitions_for_rows(
    n_rows: int,
    bytes_per_row: float,
    spark,
    target_bytes: int = TARGET_PARTITION_BYTES,
    cap: int = MAX_SIZED_PARTITIONS,
) -> int | None:
    """Row-count variant for operators that already know their working
    cardinality (e.g. the star-CC rounds, whose fixpoint fingerprint
    carries the exact edge count) — same engage-only-above-default
    contract as :func:`sized_shuffle_partitions`."""
    try:
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        default = 200
    n = math.ceil(n_rows * bytes_per_row / target_bytes)
    if n <= default:
        return None
    return min(cap, n)


def cpu_map_min_partitions(df: DataFrame, fanout: int = 1) -> int | None:
    """Minimum split count for a CPU-BOUND narrow (map-side) stage —
    the Pandas UDF codec tier, a heavy JVM regex projection, a
    per-char explode — or None when the input already arrives parallel.
    Streaming DataFrames always return None (no RDD view; the batch
    twin is where the widening belongs).

    The two sizing helpers above solve the opposite problem (too much
    per-task state); this one solves starvation.  Scans are split by
    BYTES (``spark.sql.files.maxPartitionBytes`` / row-group bounds),
    which is the right unit for JVM scans but the wrong one for a
    Python map stage whose cost is per-row CPU: a small-bytes input —
    an id projection, a dimension-sized media table, a single-row-group
    parquet file — collapses to ONE scan split and silently serializes
    minutes of codec work on one core of a 32-core host (or one core of
    a 1000-executor cluster).

    Contract: returns ``defaultParallelism * fanout`` when the planned
    input partitioning is below the session's core count, None
    otherwise — a 100 TB media table arrives with thousands of splits,
    so the round-robin exchange (and its cost) only ever engages on
    inputs small enough that the exchange is trivial.  Call it on the
    NARROWEST projection available (ids, not payloads), so what
    shuffles is a handful of bytes per row.

    ``fanout=1`` (one wave of tasks) is the measured default: at sf0.1
    each extra wave of Python tasks costs ~1.3 s across the chained
    mapInPandas stages (per-task Arrow/worker round trips), more than
    the straggler imbalance it insures against on round-robin-balanced
    ids — fanout=3 made every cheap multimodal entry ~1.3 s slower
    while the heavy codec rows gained nothing (BENCH_NOTES round 13).

    CLUSTER FIDELITY (VERDICT r13 item 7): the core-count signal is
    ``sparkContext.defaultParallelism``, which equals the worker count
    on local[N] and the total-cores snapshot on a static cluster, but
    under DYNAMIC ALLOCATION it reflects only the executors registered
    at plan time — early in an application that can be far below the
    eventual executor count, re-introducing partial starvation.
    Deployments that autoscale should set
    ``spark.graft.cpuMapTargetPartitions`` (session conf, integer) to
    the steady-state core count; when set it replaces the
    defaultParallelism probe entirely (both as the target and as the
    engage threshold).  Unset (the local default) the probe is exact
    on local[N] — the only mode this repo executes in."""
    if getattr(df, "isStreaming", False):
        return None
    spark = df.sparkSession
    # unset -> None (defaultParallelism probe below); PRESENT but
    # malformed must warn rather than silently degrade to the probe —
    # the misconfiguration this knob exists to fix on autoscaling
    # clusters would otherwise go unnoticed (ADVICE r14)
    raw = spark.conf.get("spark.graft.cpuMapTargetPartitions", None)
    cores = None
    if raw is not None:
        try:
            cores = int(raw)
        except (TypeError, ValueError):
            import warnings

            warnings.warn(
                "spark.graft.cpuMapTargetPartitions=%r is not an "
                "integer; falling back to the defaultParallelism "
                "probe (which undercounts under dynamic allocation)"
                % (raw,),
                stacklevel=2,
            )
    try:
        if cores is None:
            cores = spark.sparkContext.defaultParallelism
        n_in = df.rdd.getNumPartitions()
    except Exception:
        return None
    if n_in >= cores:
        return None
    return cores * fanout


def widen_for_cpu_map(df: DataFrame, fanout: int = 1) -> DataFrame:
    """``df`` repartitioned to :func:`cpu_map_min_partitions` when the
    planned input would starve a CPU-bound narrow stage, unchanged
    otherwise.  Call on the narrowest projection the stage needs."""
    n = cpu_map_min_partitions(df, fanout)
    return df.repartition(n) if n else df
