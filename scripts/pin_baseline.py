#!/usr/bin/env python3
"""Pin the current full-suite bench as a baseline markdown file.

Usage: python3 scripts/pin_baseline.py BENCH_FULL.json BASELINE_r14.md

Reads the one-line bench JSON (3-run per-query medians) and writes the
pin the next rounds grade against: every query gets a floor, so
regressions on operators newer than the old r7 pin are detectable.
"""
import json
import sys


def main(src: str, dst: str) -> None:
    with open(src) as f:
        b = json.load(f)
    qs = {k: v for k, v in b["queries"].items() if v >= 0}
    failed = sorted(k for k, v in b["queries"].items() if v < 0)
    lines = [
        f"# Baseline pin — full suite ({len(qs)} queries)",
        "",
        f"3-run per-query medians, local[32], sf0.1, per-query session",
        f"isolation (unpersist checkpoints + cache clear + GC between",
        f"queries). Total {b['total_s']:.1f} s; run totals {b['run_totals']}.",
        "",
        "| query | median_s |",
        "|---|---|",
    ]
    for k in sorted(qs):
        lines.append(f"| {k} | {qs[k]:.3f} |")
    if failed:
        lines.append("")
        lines.append(f"Failed (no pin): {', '.join(failed)}")
    lines.append("")
    with open(dst, "w") as f:
        f.write("\n".join(lines))
    print(f"pinned {len(qs)} queries -> {dst}; {len(failed)} failed")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
