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
