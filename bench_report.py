#!/usr/bin/env python
"""Benchmark report generator (SURVEY §2.11 H4-H5).

The reference parses `perf stat` logs in a notebook and renders
mean/std comparison charts (src/clickhouse.ipynb cells 5-18).  Here
the driver already emits structured BENCH_r{N}.json per round; this
tool renders the round-over-round history as a markdown table plus a
per-query trend, so regressions are visible without a notebook.

Usage: python bench_report.py [--dir .] [--out BENCH_REPORT.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import re
from pathlib import Path


def load_rounds(d: str) -> list[tuple[int, dict]]:
    rounds = []
    for f in glob.glob(f"{d}/BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            rounds.append((int(m.group(1)), json.loads(Path(f).read_text())))
        except (json.JSONDecodeError, OSError):
            continue
    return sorted(rounds)


def render(rounds: list[tuple[int, dict]]) -> str:
    if not rounds:
        return (
            "# BENCH report\n\nNo BENCH_r{N}.json files found — run "
            "`python bench.py` (driver records per-round results).\n"
        )
    all_queries: list[str] = []
    for _, d in rounds:
        for q in d.get("queries", {}):
            if q not in all_queries:
                all_queries.append(q)

    lines = ["# BENCH report — per-round suite timings (sec)", ""]
    latest_n, latest = rounds[-1]
    lines.append(
        f"Latest: round {latest_n}, sf={latest.get('sf')}, "
        f"{latest.get('cpus')} cpus, {latest.get('repeats')} repeats, "
        f"suite total {latest.get('value')}s over "
        f"{len(latest.get('queries', {}))} queries."
    )
    lines.append("")
    header = "| query | " + " | ".join(f"r{n}" for n, _ in rounds) + " | trend |"
    sep = "|---" * (len(rounds) + 2) + "|"
    lines += [header, sep]
    for q in all_queries:
        vals = [d.get("queries", {}).get(q) for _, d in rounds]
        cells = ["—" if v is None else f"{v:.2f}" for v in vals]
        present = [v for v in vals if v is not None]
        if len(present) >= 2 and present[0] > 0:
            ratio = present[-1] / present[0]
            trend = "↓ faster" if ratio < 0.9 else ("↑ SLOWER" if ratio > 1.1 else "flat")
        else:
            trend = "—"
        lines.append(f"| {q} | " + " | ".join(cells) + f" | {trend} |")
    lines.append("")
    lines.append(
        "Baseline context: the reference's absolute numbers "
        "(BASELINE.md) are a 1.1B-row hot-cache C++ engine; the gate "
        "is per-query cost at the SAME scale factor (BENCH_NOTES.md "
        "discusses the fixed-overhead floor at small SF)."
    )
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(Path(__file__).resolve().parent))
    ap.add_argument("--out", default=None, help="write markdown here (default stdout)")
    args = ap.parse_args()
    md = render(load_rounds(args.dir))
    if args.out:
        Path(args.out).write_text(md)
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
