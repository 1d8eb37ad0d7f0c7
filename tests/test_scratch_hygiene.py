"""/tmp hygiene (VERDICT r6 item 4): staging entries must not leak a
directory per call, and repeated calls to persist-carrying operators
must not pile up cached copies."""

from __future__ import annotations

import tempfile
from pathlib import Path

from nyc_taxi_data_clickhouse_spark import scratch
from nyc_taxi_data_clickhouse_spark.suite import registry

SF_SMOKE = "/root/testdata/sf0.001"

# the tempdir prefixes the leak regression used (bare mkdtemp per call)
_LEAK_PREFIXES = ("jsonl_", "orc_", "late_stage_", "late_ckpt_", "late_out_")


def _tmp_names() -> set[str]:
    return {p.name for p in Path(tempfile.gettempdir()).iterdir()}


def test_staging_entries_leave_tmp_flat(spark):
    """jsonl_ingest / orc_roundtrip_identity twice each: every staged
    directory must live under the single atexit-reaped scratch root —
    zero new top-level /tmp entries with the staging prefixes."""
    before = _tmp_names()
    reg = registry()
    for _ in range(2):
        reg["jsonl_ingest"].spark(spark, SF_SMOKE).collect()
        reg["orc_roundtrip_identity"].spark(spark, SF_SMOKE).collect()
    new = _tmp_names() - before
    leaked = [n for n in new if n.startswith(_LEAK_PREFIXES)]
    assert leaked == [], leaked
    # whatever WAS created sits under the scratch root, which atexit reaps
    root = scratch._ROOT
    assert root is not None
    assert any(p.name.startswith(("jsonl_", "orc_")) for p in Path(root).iterdir())


def test_track_persist_bounds_live_caches(spark):
    """Repeated substring_dup_fraction calls keep at most ONE cached
    position table per label: the second call unpersists the first."""
    a = scratch.track_persist("t_hygiene", spark.range(10))
    a.count()
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    b = scratch.track_persist("t_hygiene", spark.range(20))
    b.count()
    # the first DataFrame has been unpersisted by the second call
    assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    assert b.storageLevel.useMemory or b.storageLevel.useDisk
    b.unpersist()
    scratch._last_persisted.pop("t_hygiene", None)


def test_substring_dup_fraction_single_live_cache(spark):
    """The operator's pos table is tracked: two invocations leave one
    live cache for its label, not two."""
    reg = registry()
    reg["substring_dup_fraction"].spark(spark, SF_SMOKE).collect()
    first = scratch._last_persisted.get("ssdf_pos_False_sf0.001")
    assert first is not None
    reg["substring_dup_fraction"].spark(spark, SF_SMOKE).collect()
    second = scratch._last_persisted.get("ssdf_pos_False_sf0.001")
    # the tracker replaced (and unpersisted) the first entry; both calls
    # share one canonical logical plan, so Spark's CacheManager holds a
    # single cache entry either way — exactly one live copy
    assert second is not first
    # exactly one tracked cache for THIS label (other labels may exist
    # from other tests/sf dirs — each is bounded to one the same way)
    assert (
        sum(1 for k in scratch._last_persisted if k == "ssdf_pos_False_sf0.001")
        == 1
    )


def test_track_persist_caps_slots_per_prefix(spark):
    """ADVICE r8: distinct-input labels under one prefix must not
    accumulate unboundedly — the oldest same-prefix slot is evicted
    once MAX_SLOTS_PER_PREFIX live caches exist."""
    cap = scratch.MAX_SLOTS_PER_PREFIX
    frames = []
    for i in range(cap + 2):
        d = scratch.track_persist(f"t_captest:{i}", spark.range(10 + i))
        d.count()
        frames.append(d)
    live = [k for k in scratch._last_persisted if k.startswith("t_captest:")]
    assert len(live) == cap
    # the two oldest were evicted AND unpersisted
    for d in frames[:2]:
        assert not (d.storageLevel.useMemory or d.storageLevel.useDisk)
    for d in frames[-1:]:
        assert d.storageLevel.useMemory or d.storageLevel.useDisk
    # other prefixes are untouched by this prefix's eviction
    other = scratch.track_persist("t_capother:0", spark.range(5))
    other.count()
    assert len([k for k in scratch._last_persisted if k.startswith("t_captest:")]) == cap
    # cleanup
    for k in list(scratch._last_persisted):
        if k.startswith(("t_captest:", "t_capother:")):
            scratch._last_persisted.pop(k).unpersist()
