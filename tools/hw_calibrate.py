"""Hardware calibration for scaling-efficiency ceilings.

Runs 96 identical tasks under multiprocessing at several worker counts
and prints the wall time per level plus the N->4N efficiency between
consecutive levels. This is the ceiling ANY engine can achieve on this
time-sliced VM; BENCH/BASELINE.md reads scaling efficiency relative to it.

Two workloads:
- default: pure integer hash mixing (no memory traffic) — the ceiling for
  compute-bound stages (geometry kernels).
- --stream: random-access reads over a per-process 128 MB table — the
  ceiling for memory-bound stages (broadcast hash-join probes over a
  multi-MB relation), which share one memory bus across all cores and
  therefore scale WORSE than pure CPU on this class of VM.

Usage: python tools/hw_calibrate.py [--levels 2,8,32] [--tasks 96] [--stream]
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


_TABLE = None


def _stream_init():
    # per-process 128 MB table, built once per worker (untimed via warm map)
    global _TABLE
    import numpy as np

    _TABLE = np.arange(16_000_000, dtype=np.int64)


def _stream(seed: int) -> int:
    # hash-join-probe analog: random gathers over a table far beyond LLC
    import numpy as np

    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    tot = 0
    for _ in range(8):
        idx = rng.randint(0, len(_TABLE), 2_000_000)
        tot += int(_TABLE[idx].sum() & 0xFFFF)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8,32")
    ap.add_argument("--tasks", type=int, default=96)
    ap.add_argument("--stream", action="store_true",
                    help="memory-bound (random-gather) workload instead of pure CPU")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    fn = _stream if args.stream else _burn
    init = _stream_init if args.stream else None

    walls = {}
    for n in levels:
        with mp.Pool(n, initializer=init) as pool:
            pool.map(fn, range(n))  # warm the pool (fork + table build)
            t0 = time.monotonic()
            pool.map(fn, range(args.tasks))
            walls[n] = time.monotonic() - t0
        print(f"procs={n:3d} wall={walls[n]:.2f}s")

    for a, b in zip(levels, levels[1:]):
        eff = (walls[a] / walls[b]) / (b / a)
        print(f"eff {a}->{b}: {eff:.2f}")
    print(json.dumps({"walls": walls, "tasks": args.tasks,
                      "workload": "stream" if args.stream else "cpu"}))


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
