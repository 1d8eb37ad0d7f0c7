"""Distributed exact order statistics.

``exact_group_median`` / ``exact_group_quantile`` compute exact
(linearly interpolating, SQL ``percentile_cont``) per-group order
statistics without Spark's value-buffering ``percentile``/``median``
aggregate.  The built-in exact percentile collects every value of a
group into one aggregation buffer — O(group size) executor memory and
a serial sort per group, which is both the wall-time floor observed at
sf0.1 (a single ``F.median`` agg costs ~1.4 s where a count agg costs
0.24 s) and a straight-up OOM at 100 TB group sizes.

The bracket trick replaces it with bounded-memory passes:

1. per group: ``n`` + an approx-percentile BRACKET ``[lo, hi]`` around
   the target rank (``percentile_approx``, GK sketch, O(accuracy)
   memory).
2. per group: ``count(x < lo)`` and the DISTINCT values inside the
   bracket with multiplicities — at most ~8n/accuracy ranks wide,
   shuffled as (grp, value) counts (heavy ties collapse).
3. a per-group cumulative-count window over that small value set turns
   global ranks into values; fractional ranks interpolate the two
   straddling values exactly like ``F.percentile`` / DuckDB
   ``quantile_cont``.

Every stage is a hash aggregate or a tiny window — whole-stage
codegen, no UDF, no per-group value buffering.  The per-group side
tables (stats / below / above) are broadcast only under a group-count
bound (``BROADCAST_GROUP_BOUND``; see ``_group_table_hint``) — above
it they shuffle-join on the group key, so high group cardinality can
never turn the broadcast into a driver-memory hazard.

Why two functions: at q = 0.5 the straddle ranks n/2 and n/2+1 sit
symmetrically around the bracket center, so quantiles 0.5 ± δ are
guaranteed to bracket them for EVERY n (⌈(0.5−δ)n⌉ = ⌊n/2⌋ ≤ r1 and
⌈(0.5+δ)n⌉ ≥ r2 — the half-integer boundary does the work), and the
median runs the minimal 3-pass plan.  At arbitrary q the target rank
(n−1)q lands anywhere, and for groups smaller than the sketch
accuracy the q ± δ quantiles can collapse onto one rank (δ·n < 1), so
the general function additionally considers the bracket's neighbor
values (predecessor via the below-pass, successor via one extra
filtered pass) — two more cheap stages.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Broadcast the per-group side tables only below this group count.
# At ~100 B/row of (key, n, lo, hi, r1, r2) this is ≈50 MB — inside
# the session's 64 MB autoBroadcastJoinThreshold with headroom.
# Above it, broadcasting a per-group table is a driver-collect/OOM
# hazard, so the joins fall back to shuffle joins (still hash joins
# on the group key; AQE may re-plan them at runtime).
BROADCAST_GROUP_BOUND = 500_000


def _group_table_hint(
    stats: DataFrame,
    broadcast_stats: bool | None,
    bound: int | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Return the hint applied to every per-group side table (stats /
    below / above — all ≤ group cardinality, so one decision covers
    them).  ``broadcast_stats``: True forces the broadcast hint (the
    caller asserts bounded group cardinality), False forces shuffle
    joins, None (default) runs one cheap guard job — a count of the
    aggregated stats table, early-capped at ``bound + 1`` — so high
    group cardinality can never be silently broadcast."""
    if bound is None:
        bound = BROADCAST_GROUP_BOUND
    if broadcast_stats is None:
        broadcast_stats = stats.limit(bound + 1).count() <= bound
    return F.broadcast if broadcast_stats else (lambda d: d)


def exact_group_median(
    df: DataFrame,
    grp: str,
    col: str,
    accuracy: int = 2_000,
    out: str = "med",
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """Return ``(grp, out)`` with the exact interpolating median of
    ``col`` per group (nulls ignored; all-null groups yield a null
    row — both matching ``F.median``).

    ``accuracy``: the GK-sketch accuracy for the bracketing pass; the
    bracket then spans ≲ 8n/accuracy ranks.  Larger = tighter bracket
    (less pass-2 data) but a bigger sketch.

    ``broadcast_stats``: True = hint-broadcast the per-group side
    tables (caller asserts group cardinality ≤ BROADCAST_GROUP_BOUND),
    False = shuffle joins, None = one cheap guard job decides.
    """
    delta = 4.0 / accuracy
    stats = df.groupBy(grp).agg(
        F.count(col).alias("__n"),
        F.percentile_approx(
            col, [0.5 - delta, 0.5 + delta], accuracy
        ).alias("__b"),
    ).select(
        grp,
        "__n",
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
        # 1-based middle ranks: odd n -> both (n+1)/2; even -> n/2, n/2+1
        ((F.col("__n") + 1) / 2).cast("long").alias("__r1"),
        (F.col("__n") / 2 + 1).cast("long").alias("__r2"),
    )
    hint = _group_table_hint(stats, broadcast_stats)
    j = df.select(grp, col).join(hint(stats), grp)
    below = (
        j.filter(F.col(col) < F.col("__lo"))
        .groupBy(grp)
        .agg(F.count("*").alias("__lt"))
    )
    inb = (
        j.filter((F.col(col) >= F.col("__lo")) & (F.col(col) <= F.col("__hi")))
        .groupBy(grp, col)
        .agg(F.count("*").alias("__c"))
    )
    w = Window.partitionBy(grp).orderBy(col)
    ranked = (
        inb.withColumn("__cum", F.sum("__c").over(w))
        .join(hint(below), grp, "left")
        .na.fill({"__lt": 0})
        .withColumn("__rank_hi", F.col("__lt") + F.col("__cum"))
    )
    sel = (
        ranked.join(
            hint(stats.select(grp, "__r1", "__r2")), grp
        )
        .groupBy(grp)
        .agg(
            F.min(
                F.when(F.col("__rank_hi") >= F.col("__r1"), F.col(col))
            ).alias("__v1"),
            F.min(
                F.when(F.col("__rank_hi") >= F.col("__r2"), F.col(col))
            ).alias("__v2"),
        )
    )
    # __v1/__v2 are the r1-th / r2-th smallest values overall: the
    # first bracket value whose global cumulative count reaches the
    # rank.  The half-integer bracket center guarantees both ranks
    # land inside the bracket for every n.  Groups whose values are
    # ALL null (count(col) = 0 — F.median returns a null row for
    # them, and so must we) have no bracket and no sel row; re-attach
    # them from the stats table, which has every group.
    return (
        stats.select(grp)
        .join(sel, grp, "left")
        .select(grp, ((F.col("__v1") + F.col("__v2")) / 2).alias(out))
    )


def exact_group_quantile(
    df: DataFrame,
    grp: str,
    col: str,
    q: float,
    accuracy: int = 2_000,
    out: str = "q",
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """Return ``(grp, out)`` with the exact interpolating q-quantile of
    ``col`` per group (nulls ignored; all-null groups yield a null row,
    both matching ``F.percentile`` / DuckDB ``quantile_cont``).

    Generalizes the median's bracket plan with two extra cheap stages
    (see module docstring); prefer :func:`exact_group_median` for
    q = 0.5, which needs neither.  ``broadcast_stats`` as in
    :func:`exact_group_median`.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    delta = 4.0 / accuracy
    b_lo, b_hi = max(0.0, q - delta), min(1.0, q + delta)
    # 0-based fractional target rank (n-1)·q straddled by 1-based ranks
    # r1 = floor+1 and r2, blended with weight __w; integral ranks
    # collapse r2 onto r1 (the second value would be numerically unused
    # but must not nullify the blend via 0 * NULL)
    idx = (F.col("__n") - 1) * F.lit(q)
    r1 = F.floor(idx).cast("long") + 1
    stats = df.groupBy(grp).agg(
        F.count(col).alias("__n"),
        F.percentile_approx(col, [b_lo, b_hi], accuracy).alias("__b"),
    ).select(
        grp,
        "__n",
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
        r1.alias("__r1"),
        F.when(idx == F.floor(idx), r1)
        .otherwise(F.least(r1 + 1, F.col("__n")))
        .alias("__r2"),
        (idx - F.floor(idx)).alias("__w"),
    )
    hint = _group_table_hint(stats, broadcast_stats)
    j = df.select(grp, col).join(hint(stats), grp)
    # below-pass piggybacks the PREDECESSOR value (max below the
    # bracket); one extra filtered pass captures the SUCCESSOR for
    # groups smaller than the sketch accuracy.  They widen the
    # candidate set by one distinct value per side: below the accuracy
    # the q±δ quantiles can collapse onto one rank (δ·n < 1), leaving
    # a straddle rank just outside [lo, hi]; the neighbor always
    # covers that ±1-rank shortfall, and for n ≥ accuracy the ≥3-rank
    # GK margin means the neighbors simply lose the min() selection.
    below = (
        j.filter(F.col(col) < F.col("__lo"))
        .groupBy(grp)
        .agg(F.count("*").alias("__lt"), F.max(col).alias("__p"))
    )
    above = (
        j.filter((F.col(col) > F.col("__hi")) & (F.col("__n") < accuracy))
        .groupBy(grp)
        .agg(F.min(col).alias("__s"))
    )
    inb = (
        j.filter((F.col(col) >= F.col("__lo")) & (F.col(col) <= F.col("__hi")))
        .groupBy(grp, col)
        .agg(F.count("*").alias("__c"))
    )
    w = Window.partitionBy(grp).orderBy(col)
    ranked_in = (
        inb.withColumn("__cum", F.sum("__c").over(w))
        .join(hint(below.select(grp, "__lt")), grp, "left")
        .na.fill({"__lt": 0})
        .select(
            grp, col, (F.col("__lt") + F.col("__cum")).alias("__rank_hi")
        )
    )
    # exact rank for the predecessor: it is the largest of the __lt
    # values below the bracket, so rank_hi(pred) = __lt.  The
    # successor's true rank_hi is ≥ any straddle rank the sketch can
    # leave outside the bracket, so assigning the group total n — an
    # upper bound — keeps selection correct: min() prefers every
    # in-bracket candidate first.
    pred_rows = below.filter(F.col("__p").isNotNull()).select(
        grp, F.col("__p").alias(col), F.col("__lt").alias("__rank_hi")
    )
    succ_rows = above.join(hint(stats.select(grp, "__n")), grp).select(
        grp, F.col("__s").alias(col), F.col("__n").alias("__rank_hi")
    )
    ranked = ranked_in.unionByName(pred_rows).unionByName(succ_rows)
    sel = (
        ranked.join(
            hint(stats.select(grp, "__r1", "__r2", "__w")), grp
        )
        .groupBy(grp)
        .agg(
            F.min(
                F.when(F.col("__rank_hi") >= F.col("__r1"), F.col(col))
            ).alias("__v1"),
            F.min(
                F.when(F.col("__rank_hi") >= F.col("__r2"), F.col(col))
            ).alias("__v2"),
            F.first("__w").alias("__wf"),
        )
    )
    return (
        stats.select(grp)
        .join(sel, grp, "left")
        .select(
            grp,
            (
                F.col("__v1")
                + F.col("__wf") * (F.col("__v2") - F.col("__v1"))
            ).alias(out),
        )
    )
