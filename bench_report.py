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
    by_round: dict[int, dict] = {}
    for f in glob.glob(f"{d}/BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            data = json.loads(Path(f).read_text())
        except (json.JSONDecodeError, OSError):
            continue
        # the driver wraps the bench line in {"n","rc","tail","parsed",...}
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        if "queries" in data:
            by_round[int(m.group(1))] = data
    # the committed full payloads (BENCH_local_r{N}.json) carry the same
    # schema plus stds/scan detail and survive driver tail truncation —
    # prefer them when present
    for f in glob.glob(f"{d}/BENCH_local_r*.json"):
        m = re.search(r"BENCH_local_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            data = json.loads(Path(f).read_text())
        except (json.JSONDecodeError, OSError):
            continue
        if "queries" in data:
            by_round[int(m.group(1))] = data
    return sorted(by_round.items())


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


# --- H5 comparison chart (src/clickhouse.ipynb cells 12/16 analog) --------
# Dependency-free SVG grouped bars.  Palette: first three categorical
# slots of the validated reference palette (light mode), fixed order by
# round, never cycled; validator-passed (CVD ΔE 9.2, normal 27.6; the
# aqua slot's <3:1 contrast is relieved by direct labels + the table
# view in the markdown report).
_SERIES = ["#2a78d6", "#eb6834", "#1baf7a"]
_SURFACE, _INK, _INK2, _GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e4e3e0"


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_svg(rounds: list[tuple[int, dict]]) -> str:
    """Grouped horizontal bars: per-query mean sec, one bar per round
    (last 3 rounds — the all-pairs-validated series cap), queries
    sorted by latest-round time."""
    rounds = rounds[-3:]
    if not rounds:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="300" height="40"><text x="8" y="24" fill="{_INK}" font-size="13">no BENCH rounds found</text></svg>'
    latest = rounds[-1][1].get("queries", {})
    queries = sorted(latest, key=lambda q: -latest[q])
    vmax = max(
        (d.get("queries", {}).get(q, 0) or 0) for _, d in rounds for q in queries
    ) or 1.0

    bar_h, gap_bar, gap_group, left, right, top = 12, 2, 10, 190, 70, 46
    group_h = len(rounds) * bar_h + (len(rounds) - 1) * gap_bar
    plot_w = 520
    height = top + len(queries) * (group_h + gap_group) + 34
    width = left + plot_w + right

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="system-ui, sans-serif">',
        f'<rect width="{width}" height="{height}" fill="{_SURFACE}"/>',
        f'<text x="{left}" y="20" fill="{_INK}" font-size="14" font-weight="600">'
        f"Suite per-query mean (sec), sf={rounds[-1][1].get('sf')}</text>",
    ]
    # legend (>=2 series); a single round is named by the title instead
    if len(rounds) > 1:
        x = left
        for i, (n, _) in enumerate(rounds):
            out.append(
                f'<rect x="{x}" y="28" width="10" height="10" rx="2" fill="{_SERIES[i]}"/>'
                f'<text x="{x + 14}" y="37" fill="{_INK2}" font-size="11">round {n}</text>'
            )
            x += 80
    else:
        out[-1] = out[-1].replace(
            "</text>", f" — round {rounds[0][0]}</text>"
        )
    # recessive x grid at quarter marks
    for frac in (0.25, 0.5, 0.75, 1.0):
        gx = left + plot_w * frac
        out.append(
            f'<line x1="{gx:.0f}" y1="{top}" x2="{gx:.0f}" y2="{height - 30}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
            f'<text x="{gx:.0f}" y="{height - 14}" fill="{_INK2}" font-size="10" '
            f'text-anchor="middle">{vmax * frac:.2g}</text>'
        )
    y = top
    for q in queries:
        out.append(
            f'<text x="{left - 8}" y="{y + group_h / 2 + 4}" fill="{_INK}" '
            f'font-size="11" text-anchor="end">{_esc(q)}</text>'
        )
        for i, (_, d) in enumerate(rounds):
            v = d.get("queries", {}).get(q)
            by = y + i * (bar_h + gap_bar)
            if v is None:
                out.append(
                    f'<text x="{left + 4}" y="{by + bar_h - 2}" fill="{_INK2}" '
                    f'font-size="10">—</text>'
                )
                continue
            w = max(plot_w * v / vmax, 1)
            r = min(4.0, w)  # data-end rounded, baseline square
            out.append(
                f'<path d="M{left},{by} h{w - r:.1f} a{r},{r} 0 0 1 {r},{r} '
                f'v{bar_h - 2 * r} a{r},{r} 0 0 1 -{r},{r} h-{w - r:.1f} z" '
                f'fill="{_SERIES[i]}"/>'
            )
            if i == len(rounds) - 1:  # direct label: latest round only
                out.append(
                    f'<text x="{left + w + 5:.1f}" y="{by + bar_h - 2}" '
                    f'fill="{_INK2}" font-size="10">{v:.2f}</text>'
                )
        y += group_h + gap_group
    out.append(
        f'<line x1="{left}" y1="{top}" x2="{left}" y2="{height - 30}" '
        f'stroke="{_INK2}" stroke-width="1"/>'
    )
    out.append("</svg>")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(Path(__file__).resolve().parent))
    ap.add_argument("--out", default=None, help="write markdown here (default stdout)")
    ap.add_argument(
        "--svg",
        default=None,
        help="also write the H5 comparison chart (grouped bars, last 3 rounds) here",
    )
    args = ap.parse_args()
    rounds = load_rounds(args.dir)
    md = render(rounds)
    if args.svg:
        Path(args.svg).write_text(render_svg(rounds))
        print(f"wrote {args.svg}")
    if args.out:
        Path(args.out).write_text(md)
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
