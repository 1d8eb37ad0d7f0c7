#!/usr/bin/env python
"""Regenerate the hand-drifting counts in README.md / BENCH_NOTES.md
from the registry itself (ADVICE r1: counts were stale the moment a
new entry landed; generate, don't hand-write).

Rewrites, in place:
- README.md:   "... any of the N registry entries (M oracle-gated)"
               and the "(M+ oracle-gated queries)" / "T+ tests:" blurbs
- BENCH_NOTES.md: "Registry: N entries, M oracle-gated; full suite
               T tests green."

Usage: python docs_refresh.py [--check]   (--check: exit 1 on drift)
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))


def registry_counts() -> tuple[int, int]:
    from nyc_taxi_data_clickhouse_spark import suite

    reg = suite.registry()
    oracle_gated = sum(1 for spec in reg.values() if spec.oracle is not None)
    return len(reg), oracle_gated


def collected_test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse pytest collection output:\n{out[-500:]}")
    return int(m.group(1))


def rewrite(path: Path, subs: list[tuple[str, str]], check: bool) -> bool:
    text = path.read_text()
    new = text
    for pattern, repl in subs:
        new, n = re.subn(pattern, repl, new)
        if n == 0:
            print(f"warning: pattern not found in {path.name}: {pattern}")
    if new == text:
        return False
    if not check:
        path.write_text(new)
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="exit 1 on drift, write nothing")
    args = ap.parse_args()

    n_entries, n_oracle = registry_counts()
    n_tests = collected_test_count()
    print(f"registry: {n_entries} entries, {n_oracle} oracle-gated; {n_tests} tests")

    drift = False
    drift |= rewrite(
        ROOT / "README.md",
        [
            (
                r"any of the \d+ registry entries \(\d+ oracle-gated\)",
                f"any of the {n_entries} registry entries ({n_oracle} oracle-gated)",
            ),
            (r"\(\d+\+? oracle-gated queries\)", f"({n_oracle} oracle-gated queries)"),
            (r"`tests/` — \d+\+? tests:", f"`tests/` — {n_tests} tests:"),
        ],
        args.check,
    )
    drift |= rewrite(
        ROOT / "BENCH_NOTES.md",
        [
            (
                r"Registry: \d+\s*\nentries, \d+ oracle-gated; full suite \d+ tests green\.",
                f"Registry: {n_entries}\nentries, {n_oracle} oracle-gated; "
                f"full suite {n_tests} tests green.",
            ),
        ],
        args.check,
    )
    n_rows_only = n_entries - n_oracle
    drift |= rewrite(
        ROOT / "COVERAGE.md",
        [
            (
                # tolerate reflow: the phrase may wrap at any whitespace
                r"\(\d+ of the \d+\s+entries are\s+oracle-gated,\s+\d+ rows-only, as of this refresh",
                f"({n_oracle} of the {n_entries} entries are\noracle-gated"
                f", {n_rows_only} rows-only, as of this refresh",
            ),
        ],
        args.check,
    )
    if args.check and drift:
        print("drift detected (counts in docs are stale)")
        sys.exit(1)
    print("docs are current" if not drift else "docs updated")


if __name__ == "__main__":
    main()
