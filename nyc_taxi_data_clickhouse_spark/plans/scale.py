"""Scale utilities: bucketed co-located joins and skew salting.

These are the two techniques the 100 TB deployment leans on when the
defaults (broadcast + AQE) run out:

- **Bucketing** pre-shuffles a table ONCE at write time; every later
  equi-join or aggregation on the bucket key reads co-located buckets
  and skips its shuffle entirely.  The reference's MergeTree clustering
  (README.md:548) solves the same problem for its benchmark keys; the
  Spark-native equivalent is ``bucketBy`` on the join/agg key.
- **Salting** splits a pathologically hot key across N sub-keys so one
  reducer doesn't receive the whole key's rows.  AQE's skew-join
  handles moderate skew automatically; salting is the explicit fix for
  extreme, known-hot keys (the NULL key of an outer join, a viral
  user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table.  Joins/aggregations between tables bucketed the same way on
    the same key plan WITHOUT a shuffle (verified in tests)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a
    random salt in [0, salt_buckets); the (smaller) right side is
    replicated once per salt value via an explode — so a hot key's rows
    spread over ``salt_buckets`` reducers instead of one.

    Output equals ``left.join(right, key, how)`` for inner/left joins.
    The salt uses a hash of a per-row unique expression
    (monotonically_increasing_id), not rand(), so replays are
    deterministic per task layout.
    """
    salted_left = left.withColumn(
        "__salt",
        (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets).cast("int"),
    )
    replicated_right = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    joined = salted_left.join(replicated_right, [key, "__salt"], how)
    return joined.drop("__salt")


def explain_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains an Exchange (shuffle) —
    plan-shape assertion helper for tests and tuning."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


# ---------------------------------------------------------------------------
# Z-order clustering (multi-dimensional data layout)
# ---------------------------------------------------------------------------

def zorder_key(cols: list, bits: int = 21) -> "F.Column":
    """Morton (Z-order) interleave of up to 3 non-negative integer
    columns into one long sort key, entirely in JVM expressions.

    Sorting (or range-partitioning) by this key before a parquet write
    clusters rows so that BOTH dimensions' min/max row-group stats stay
    tight — a filter on either column prunes row groups, where a plain
    lexicographic sort only prunes on its leading column.  This is the
    Spark-native analog of the multi-dimensional clustering the
    reference gets one-dimensionally from its MergeTree primary key
    (README.md:548).

    ``bits`` caps each dimension at 2^bits-1 (values are clamped);
    21 bits x 3 dims fills the 63 usable bits of a long.  Inputs must
    be pre-scaled to non-negative ints (rank, epoch-day, bucketed
    price, ...).
    """
    n = len(cols)
    if not 1 <= n <= 3:
        raise ValueError("zorder_key supports 1-3 columns")
    total = bits * n
    key = F.lit(0).cast("long")
    clamped = [
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col(c).cast("long") if isinstance(c, str) else c.cast("long"),
                    F.lit((1 << bits) - 1).cast("long")),
        )
        for c in cols
    ]
    # bit b of column d lands at output position b*n + d
    for b in range(bits):
        for d, col in enumerate(clamped):
            out_pos = b * n + d
            if out_pos >= total:
                continue
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, out_pos))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list,
    bits: int = 21,
    num_files: int = 32,
) -> None:
    """Write parquet clustered by the Z-order of ``zcols``:
    range-partition on the Morton key (so files cover disjoint key
    ranges), sort within partitions, drop the helper key."""
    keyed = df.withColumn("__z", zorder_key(zcols, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

def compact_parquet(
    spark, src: str, dst: str, target_file_mb: int = 128, sort_cols: list | None = None
) -> tuple[int, int]:
    """Rewrite a parquet directory of many small files into few
    ~target-sized files (the small-files problem is the dominant
    operational failure of large parquet lakes: per-file open cost and
    task-scheduling overhead grow linearly with file count).

    Sizes output by measuring the source bytes, not guessing row
    counts; optional ``sort_cols`` re-establishes clustering (and thus
    row-group min/max pruning) in the same pass.  Returns
    (files_before, files_after).
    """
    import glob
    import os

    files = [f for f in glob.glob(f"{src}/*.parquet")]
    total_mb = sum(os.path.getsize(f) for f in files) / (1024 * 1024)
    n_out = max(1, round(total_mb / target_file_mb))
    df = spark.read.parquet(src)
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(dst)
    return len(files), len(glob.glob(f"{dst}/*.parquet"))
