"""Session-scoped scratch directories + cache bookkeeping.

Several suite entries materialize a table copy (CSV/JSON/ORC/parquet
roundtrips, the trips E2E pipeline) to prove the source/sink path under
the correctness gate.  Using bare ``tempfile.mkdtemp`` per invocation
leaked one directory per run across registry-wide sweeps (plan-hygiene
test, bench, driver gate).  This module hands out subdirectories of ONE
process-scoped root that is removed at interpreter exit.

:func:`track_persist` solves the cache-side analogue (VERDICT r6
item 4): an operator whose result is consumed lazily cannot unpersist
inside its own body — the cache must outlive the return — but repeated
calls must not pile up cached copies either.  Tracking by label keeps
at most one live cache per operator; the final one is freed by the
caller's ``clearCache`` / session teardown as before.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_ROOT: str | None = None
_last_persisted: dict[str, "DataFrame"] = {}


def _cleanup() -> None:
    global _ROOT
    if _ROOT is not None:
        shutil.rmtree(_ROOT, ignore_errors=True)
        _ROOT = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch subdirectory, reaped at process exit.

    Each call returns a new empty directory (entries may run several
    times per process — e.g. bench repeats — and Spark's
    ``mode("overwrite")`` handles re-use of a prior path anyway).
    """
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(_cleanup)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)


#: Max live persisted slots per label PREFIX (the part before the first
#: ``:``).  Labels carry the input plan's semantic hash so different
#: inputs never evict each other MID-USE — but a long-lived session
#: sweeping many inputs (sf dirs, columns) would otherwise accumulate
#: one never-freed cache per distinct plan (ADVICE r8).  Evicting the
#: oldest slot of the same prefix bounds that growth; 4 is enough for
#: every in-repo pattern (an operator touches at most two inputs per
#: invocation, and eviction only bites plans from PRIOR invocations,
#: whose guard counts and downstream joins have already consumed them).
MAX_SLOTS_PER_PREFIX = 4


def track_persist(label: str, df: "DataFrame") -> "DataFrame":
    """MEMORY_AND_DISK-persist ``df``, unpersisting whatever DataFrame
    was previously tracked under ``label`` — bounded cache growth for
    operators whose lazily-consumed results forbid in-body unpersist.
    Include any input identity (e.g. the sf dir name) in ``label`` so
    different inputs never evict each other mid-use; slots sharing a
    ``prefix:`` are additionally capped at :data:`MAX_SLOTS_PER_PREFIX`
    live caches (oldest evicted first)."""
    from pyspark import StorageLevel

    def _free(frame: "DataFrame") -> None:
        try:
            frame.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free

    prev = _last_persisted.pop(label, None)
    if prev is not None:
        _free(prev)
    prefix = label.split(":", 1)[0]
    same_prefix = [
        key for key in _last_persisted if key.split(":", 1)[0] == prefix
    ]
    # dict preserves insertion order => same_prefix[0] is the oldest
    while len(same_prefix) >= MAX_SLOTS_PER_PREFIX:
        oldest = same_prefix.pop(0)
        _free(_last_persisted.pop(oldest))
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _last_persisted[label] = df
    return df
