"""Embedding-column operators beyond search: centroid aggregation and
scalar quantization (SURVEY §7 extension scope).

Centroids feed clustering / class prototypes; int8 scalar quantization
is the standard 4x storage cut before shipping vectors to an ANN
index.  Both stay in JVM expressions (higher-order functions over the
array column) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def centroids_long(
    emb: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "label",
) -> DataFrame:
    """Per-key mean vector in long format: (key, pos, c) with pos
    1-indexed.

    ``posexplode`` fans each row out to dim rows, then a (key, pos)
    hash aggregate averages — partial aggregation combines map-side,
    so the shuffle carries at most |keys| * dim rows per partition
    regardless of input size.  Long format beats assembling arrays
    here: no order-sensitive collect_list, and downstream joins on
    (key, pos) stay hashable.
    """
    return (
        emb.select(F.col(key_col), F.posexplode(vec_col).alias("pos0", "v"))
        .groupBy(key_col, (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("v"), 4).alias("c"))
    )


def quantize_int8_long(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 scalar quantization in long format:
    (id, pos, q) with q = round(v * 127 / max(|v|)), pos 1-indexed.

    The per-vector scale comes from a higher-order ``aggregate`` over
    the array (map-only, no shuffle); the explode then emits the
    quantized components.  Zero vectors yield NULL q (0/0 guard)."""
    max_abs = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    scaled = emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos0", "v"),
        F.nullif(max_abs, F.lit(0.0)).alias("__scale"),
    )
    return scaled.select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v").cast("double") * 127.0 / F.col("__scale"), 0)
        .cast("long")
        .alias("q"),
    )
