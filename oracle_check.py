"""Spot-verify named registry entries against their DuckDB oracle.

Usage::

    python oracle_check.py <sf_dir> <entry> [entry ...]

Exit 0 iff every named entry matches (rows + schema + hash).  The
repo-wide sweep is ``correctness_local.py``; this is the per-change
fast loop for an optimization round.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from nyc_taxi_data_clickhouse_spark import suite
    from nyc_taxi_data_clickhouse_spark.session import get_spark
    from tests.oracle_util import compare

    spark = get_spark(app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    reg = suite.registry()
    rc = 0
    for name in names:
        spec = reg.get(name)
        if spec is None:  # ADVICE r15: mirror plans capture — skip, don't abort
            print(f"SKIP/UNKNOWN {name}", file=sys.stderr)
            rc = 1
            continue
        res = compare(spec.spark(spark, sf_dir), spec.oracle, sf_dir)
        ok = bool(res.get("match"))
        print(
            f"{name}: {'OK' if ok else 'FAIL'} rows={res['rows_spark']}/"
            f"{res['rows_oracle']} hash_eq="
            f"{res['hash_spark'] == res['hash_oracle']}"
            f"{' (tol)' if res.get('tol_match') else ''}"
        )
        if not ok:
            rc = 1
        spark.catalog.clearCache()
    return rc


if __name__ == "__main__":
    sys.exit(main())
