"""As-of join — a custom operator Spark lacks natively (SURVEY §7
"custom operators": composition of existing DataFrame ops, no UDF).

``asof_join(left, right)``: for every left row, attach the payload of
the latest right row with ``right.ts <= left.ts`` within the same
``by`` key (the classic point-in-time / last-known-value join of
time-series stores).

Implementation — the SCALABLE pattern, not a windowed cross join:
union both sides tagged, sort within each ``by`` partition by
(ts, side) and carry the last non-null right payload forward with
``last(..., ignorenulls=True)``.  Cost: ONE shuffle of (left+right)
on the by-key + a partition-local sort — same asymptotics as a
sort-merge join, no key-range blowup, no N² anywhere.  Skewed by-keys
are handled by AQE; at 100 TB this is the plan you want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join: latest right row with right.on <= left.on
    per by-key.  Right-side payload columns arrive as
    ``<col><suffix>`` (NULL when no prior right row exists).

    Tie rule: right rows at exactly left.on ARE visible (<=); among
    right rows sharing the same timestamp the last one in (on, value)
    order wins — deterministic for unique (by, on) right sides, which
    callers should guarantee (pre-aggregate otherwise).
    """
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    # right rows carry only (by, on) from the left schema; other left
    # columns ride as typed NULLs so the union lines up
    tagged_right = right.select(
        *[
            F.col(c) if c in (by, on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )

    unioned = tagged_left.unionByName(tagged_right)
    # right rows (side=0) sort BEFORE left rows at equal ts -> visible
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
