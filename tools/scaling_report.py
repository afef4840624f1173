"""Render the N→4N scaling section of BENCH/BASELINE.md from bench JSON.

Input: a jsonl file of `bench.py --skip-battery` outputs at several --cpus
levels (optionally two input sizes), e.g.

    SPARK_GRAFT_BENCH_AGG=min \
    for c in 2 8 32; do python bench.py --cpus $c --skip-battery --repeat 5; done

Usage: python tools/scaling_report.py results.jsonl [--hw 2:60.74,8:16.09,32:5.49]

Prints the markdown tables; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json

PATHS = ["pages_pipeline", "text_extract", "spatial_join_pages",
         "tile_agg_pages", "knn_pages"]
SATURATION_S = 1.0  # paths faster than this are scheduling-bound


def load(path):
    rows = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


def table(rows, hw_eff=None):
    """hw_eff: optional {cpus: seconds} pure-CPU calibration times; adds a
    hardware-ceiling row so each path's efficiency can be read relative to
    what the VM itself achieves on embarrassingly-parallel work."""
    rows = sorted(rows, key=lambda r: r["cpus"])
    cpus = [r["cpus"] for r in rows]
    hdr = ["path"] + [f"local[{c}] s" for c in cpus]
    for a, b in zip(cpus, cpus[1:]):
        hdr.append(f"eff {a}→{b}")
    lines = ["| " + " | ".join(hdr) + " |",
             "|" + "---|" * len(hdr)]
    totals = [0.0] * len(rows)
    for p in PATHS:
        t = [r["queries"][p] for r in rows]
        for i, v in enumerate(t):
            totals[i] += v
        cells = [p] + [f"{v:.2f}" for v in t]
        for (a, b), (ca, cb) in zip(zip(t, t[1:]), zip(cpus, cpus[1:])):
            if min(a, b) < SATURATION_S:
                cells.append("sat.")
            else:
                cells.append(f"{a / b / (cb / ca):.2f}")
        lines.append("| " + " | ".join(cells) + " |")
    cells = ["**TOTAL**"] + [f"**{v:.2f}**" for v in totals]
    for (a, b), (ca, cb) in zip(zip(totals, totals[1:]), zip(cpus, cpus[1:])):
        cells.append(f"**{a / b / (cb / ca):.2f}**")
    lines.append("| " + " | ".join(cells) + " |")
    if hw_eff:
        t = [hw_eff.get(c) for c in cpus]
        cells = ["hw ceiling (pure CPU)"] + [
            f"{v:.2f}" if v is not None else "—" for v in t
        ]
        for (a, b), (ca, cb) in zip(zip(t, t[1:]), zip(cpus, cpus[1:])):
            if a is None or b is None:
                cells.append("—")
            else:
                cells.append(f"{a / b / (cb / ca):.2f}")
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def _parse_hw(s):
    out = {}
    for part in s.split(","):
        c, sec = part.split(":")
        out[int(c)] = float(sec)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--hw", type=_parse_hw, default=None,
                    help="pure-CPU calibration as cpus:sec pairs, e.g. 2:60.74,8:16.09,32:5.49")
    args = ap.parse_args()
    rows = load(args.jsonl)
    by_size = {}
    for r in rows:
        by_size.setdefault(r["extras"].get("pages_rows"), []).append(r)
    for size, rs in sorted(by_size.items()):
        print(f"\n### {size:,} pages\n")
        print(table(rs, hw_eff=args.hw))
        for r in sorted(rs, key=lambda r: r["cpus"]):
            e = r["extras"]
            print(f"\n- local[{r['cpus']}]: join "
                  f"{e.get('spatial_join_pairs_per_sec', 0):,.0f} pairs/s, "
                  f"knn {e.get('knn_rows_per_sec', 0):,.0f} rows/s, "
                  f"tiles {e.get('tile_assignments_per_sec', 0):,.0f} rows/s")


if __name__ == "__main__":
    main()
