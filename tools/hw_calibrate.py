"""Pure-CPU hardware calibration for scaling-efficiency ceilings.

Runs 96 identical CPU-bound tasks (integer hash mixing, no memory traffic,
no Spark) under multiprocessing at several worker counts and prints the
wall time per level plus the N->4N efficiency between consecutive levels.
This is the ceiling ANY engine can achieve on this time-sliced VM for
embarrassingly parallel work; BENCH/BASELINE.md reads scaling efficiency
relative to it.

Usage: python tools/hw_calibrate.py [--levels 2,8,32] [--tasks 96]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(seed: int) -> int:
    # ~0.55 s of pure integer work per task on an uncontended core.
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(12_000_000):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8,32")
    ap.add_argument("--tasks", type=int, default=96)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    walls = {}
    for n in levels:
        with mp.Pool(n) as pool:
            pool.map(_burn, range(n))  # warm the pool (fork + import cost)
            t0 = time.monotonic()
            pool.map(_burn, range(args.tasks))
            walls[n] = time.monotonic() - t0
        print(f"procs={n:3d} wall={walls[n]:.2f}s")

    for a, b in zip(levels, levels[1:]):
        eff = (walls[a] / walls[b]) / (b / a)
        print(f"eff {a}->{b}: {eff:.2f}")
    print(json.dumps({"walls": walls, "tasks": args.tasks}))


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
