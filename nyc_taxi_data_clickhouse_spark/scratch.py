"""Session-scoped scratch directories for roundtrip suite entries.

Several suite entries materialize a table copy (CSV/JSON/ORC/parquet
roundtrips, the trips E2E pipeline) to prove the source/sink path under
the correctness gate.  Using bare ``tempfile.mkdtemp`` per invocation
leaked one directory per run across registry-wide sweeps (plan-hygiene
test, bench, driver gate).  This module hands out subdirectories of ONE
process-scoped root that is removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


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
