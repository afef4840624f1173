"""Scaling-efficiency evidence (north rule: throughput scaling ≥0.8 from N
to 4N executors, evidenced in this sandbox as local[8] vs local[32] on the
SAME input — the driver-sanctioned proxy for two cluster sizes).

Runs bench.py headline paths at both parallelism levels in fresh JVMs,
computes per-path speedup and efficiency = (rate@32) / (4 × rate@8),
and writes BENCH/SCALING.md (BENCH/BASELINE.md is the curated
evidence document and is maintained by hand — never clobbered here).

Usage: python tools/bench_scaling.py [--sf-dir /root/testdata/sf0.1] [--pages N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, pages: int | None, repeat: int = 1) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--cpus", str(cpus),
           "--sf-dir", sf_dir, "--skip-battery", "--repeat", str(repeat)]
    if pages:
        cmd += ["--pages", str(pages)]
    # min-of-N per leg (BENCH/BASELINE.md methodology): the sandbox host is
    # time-sliced with invisible preemption; under additive interference the
    # minimum estimates uncontended runtime
    env = dict(os.environ, SPARK_GRAFT_BENCH_AGG=os.environ.get(
        "SPARK_GRAFT_BENCH_AGG", "min"))
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at cpus={cpus}: {out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pages", type=int, default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=4)
    args = ap.parse_args()

    lo = run(args.n, args.sf_dir, args.pages, args.repeat)
    hi = run(args.n4, args.sf_dir, args.pages, args.repeat)
    ratio = args.n4 / args.n

    paths = ["pages_pipeline", "spatial_join_pages", "tile_agg_pages", "knn_pages"]
    lines = [
        "# BENCH/SCALING — raw two-level scaling run (see BENCH/BASELINE.md for the curated evidence)",
        "",
        f"Same job, same input (`{args.sf_dir}`, {lo['extras']['pages_rows']:,} synthetic pages, "
        f"1000 regions), two parallelism levels: `local[{args.n}]` vs `local[{args.n4}]` "
        "(sandbox proxy for N vs 4N executors per the driver rule).",
        "",
        "| path | sec @N | sec @4N | rows/s @N | rows/s @4N | speedup | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = []
    for p in paths:
        t_lo, t_hi = lo["queries"][p], hi["queries"][p]
        rows = lo["extras"]["pages_rows"]
        r_lo, r_hi = rows / t_lo, rows / t_hi
        speedup = t_lo / t_hi
        eff = speedup / ratio
        effs.append((p, eff))
        lines.append(
            f"| {p} | {t_lo:.1f} | {t_hi:.1f} | {r_lo:,.0f} | {r_hi:,.0f} "
            f"| {speedup:.2f}× | **{eff:.2f}** |"
        )
    total_lo = sum(lo["queries"][p] for p in paths)
    total_hi = sum(hi["queries"][p] for p in paths)
    overall = (total_lo / total_hi) / ratio
    lines += [
        f"| **total** | {total_lo:.1f} | {total_hi:.1f} | — | — | {total_lo/total_hi:.2f}× | **{overall:.2f}** |",
        "",
        f"Overall scaling efficiency N→4N: **{overall:.2f}** "
        f"(target ≥ 0.8 per BASELINE.json north rule; efficiency = speedup / {ratio:.0f}).",
        "",
        "## Headline throughput (at 4N)",
        "",
        f"- spatial-join: **{hi['extras']['spatial_join_rows_per_sec']:,.0f} pages/s** "
        f"({hi['extras']['spatial_join_pairs_per_sec']:,.0f} output pairs/s, "
        f"{hi['extras']['spatial_join_pairs']:,} pairs)",
        f"- tile assignments: **{hi['extras']['tile_assignments_per_sec']:,.0f} rows/s** "
        f"({hi['extras']['tiles']:,} occupied tiles)",
        f"- kNN (k=1, 1000 targets): **{hi['extras']['knn_rows_per_sec']:,.0f} rows/s**",
        f"- pages synthesis+extract+cell: **{hi['extras']['pages_rows_per_sec']:,.0f} rows/s**",
        "",
        "Reference workload context (BASELINE.md): the reference is a single-node",
        "single-thread kernel library; its asv suite measures e.g. contains() on",
        "100k points vs one polygon. The engine's per-core exact point-in-polygon",
        "refine throughput is in the same class, and the plan (cell prune +",
        "broadcast + Arrow batches) is what carries it to cluster scale.",
        "",
        "Raw bench JSON:",
        "```json",
        json.dumps(lo),
        json.dumps(hi),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "SCALING.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:20]))
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
