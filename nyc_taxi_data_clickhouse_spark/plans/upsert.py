"""Latest-wins merge upsert over immutable columnar storage.

Plain parquet has no MERGE statement; the scalable pattern is
recompute-and-overwrite: union the current snapshot with the update
batch, keep the newest row per key, and rewrite only the partitions
the update batch touches (dynamic partition overwrite).  The
reference's pipeline sidesteps updates entirely (append-only Log +
one-shot CTAS, README.md:506, 547); a complete engine needs the
update path.

Scale notes: the window shuffles on the merge key once.  With the
gold table bucketed on the key (plans/scale.write_bucketed) the
current side arrives pre-partitioned and only the (small) update
batch shuffles.  Partition pruning keeps the rewrite proportional to
the touched partitions, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Union ``current`` and ``updates``; per key keep the row with
    the highest ``version_col`` (update batch wins version ties —
    the deterministic tie-break a reprocessed batch needs)."""
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = W.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
