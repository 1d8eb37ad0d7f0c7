"""Session-conf hygiene: registry entries must not leave unrestored
global conf mutations behind (VERDICT r4 item 6).

The one sanctioned exception is the documented session-wide invariant
``spark.sql.legacy.parquet.nanosAsLong=true`` (session.py): it is only
ever set TO "true" (idempotent, never flipped back), and it only
changes behavior for TIMESTAMP(NANOS) parquet columns — which Spark
otherwise rejects outright — so establishing it mid-session cannot
alter any result that was previously readable.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_clickhouse_spark import suite

SF = "/root/testdata/sf0.001"

#: confs that runtime code is allowed to establish, with the ONLY value
#: it may establish them to (the documented invariant set).
_SANCTIONED = {"spark.sql.legacy.parquet.nanosAsLong": "true"}

#: runtime-noise confs Spark itself mutates during execution (AQE,
#: codegen ids, streaming checkpoints) — not set by our code.
_SPARK_INTERNAL_PREFIXES = (
    "spark.sql.execution.",
    "spark.sql.streaming.checkpointLocation",
)


def _conf_snapshot(spark) -> dict[str, str]:
    # RuntimeConfig has no getAll in the Connect-free API surface we
    # target; go through the JVM conf map, which is the ground truth
    # for what a later query would observe.
    jconf = spark.conf._jconf.getAllAsJava()
    return {
        k: v
        for k, v in dict(jconf).items()
        if not k.startswith(_SPARK_INTERNAL_PREFIXES)
    }


def test_registry_entries_leave_conf_unchanged(spark):
    """Run entries covering every module that touches spark.conf (the
    events batch reader, the streaming reader, and a plain table scan)
    and assert the conf delta is at most the sanctioned invariant set."""
    before = _conf_snapshot(spark)

    reg = suite.registry()
    for name in ("q1_group_count", "event_transition_counts",
                 "streaming_hourly_rollup"):
        if name not in reg:  # pragma: no cover - registry always has them
            pytest.skip(f"{name} missing from registry")
        reg[name].spark(spark, SF).collect()

    after = _conf_snapshot(spark)
    changed = {
        k: (before.get(k), after.get(k))
        for k in set(before) | set(after)
        if before.get(k) != after.get(k)
    }
    for key, (_, new) in changed.items():
        assert key in _SANCTIONED and new == _SANCTIONED[key], (
            f"unsanctioned session conf mutation: {key}: "
            f"{changed[key][0]!r} -> {new!r}"
        )


def test_nanos_invariant_is_set_by_factory(spark):
    """session.get_spark bakes the invariant in at build time, so code
    running on OUR session never even needs the idempotent re-set."""
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    )
