#!/usr/bin/env python3
"""Regenerate tools/idle_floor.json — the committed idle-floor ledger.

PlansCoverageSpec lints "every heavy query has a PLANS.md section"
against BENCH_DETAIL.json, but the driver regenerates that artifact
post-commit at whatever load the box carries, and sub-second queries
phantom-spike past any fixed threshold under contention (r14: the
regeneration at load 5.7 / calib 0.118->0.447 pushed ann_sq_error
0.18s -> 5.31s min and turned the suite red). The lint therefore uses
min(live min, committed idle floor) per query; this script writes the
floor ledger from a BUILDER-RUN IDLE sweep (see the SCALING noise
protocol: no concurrent JVMs, load < ~2.5, calib flat).

Usage: tools/idle_floor.py [BENCH_DETAIL.json] [tools/idle_floor.json]

Refuses to write from a sweep that self-evidently wasn't idle
(load_avg > 3 or calib end/start > 2) unless --force is passed,
so a contaminated artifact can't silently become the floor.
"""
import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "BENCH_DETAIL.json"
    dst = args[1] if len(args) > 1 else "tools/idle_floor.json"
    with open(src, encoding="utf-8") as f:
        bench = json.load(f)
    load = float(bench.get("load_avg", 0.0))
    calib = bench.get("calib_sec", {}) or {}
    start, end = float(calib.get("start", 0) or 0), float(calib.get("end", 0) or 0)
    ratio = (end / start) if start > 0 else 1.0
    if (load > 3.0 or ratio > 2.0) and not force:
        sys.exit(
            f"refusing: sweep not idle (load_avg={load}, calib end/start="
            f"{ratio:.2f}); re-run Bench on an idle box or pass --force"
        )
    floors = {
        name: entry["min"]
        for name, entry in sorted(bench["queries"].items())
        if not entry.get("noisy", False)
    }
    out = {
        "source_load_avg": load,
        "source_calib_sec": calib,
        "n_floors": len(floors),
        "floors": floors,
    }
    with open(dst, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}: {len(floors)} floors (load {load}, calib ratio {ratio:.2f})")


if __name__ == "__main__":
    main()
