#!/usr/bin/env python
"""No-Spark hardware probe: per-core sustained throughput at P busy cores.

Each worker loops a fixed CPU-bound numpy kernel for WORK_S seconds and
reports iterations/s. Per-core throughput at P workers, divided by the
2-worker figure, is the hardware ceiling for any measured 2->P scaling
efficiency on this VM (frequency scaling drops per-core clocks as more
cores go busy). Levels run interleaved (e.g. 8,2,8,2) so host noise
hits both sides of every ratio.

Usage: python tools/cpu_clock_probe.py [levels...]   (default: 8 2 8 2 32 2)
Prints one JSON line: {"per_core_ips": {P: [...reps]}, "ceiling_2toP": {...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

WORK_S = 20.0


def _worker(q):
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.random(200_000)
    b = rng.random(200_000)
    # spin until the parent-set deadline
    deadline = time.time() + WORK_S
    iters = 0
    while time.time() < deadline:
        c = np.sort(a * b + np.sqrt(a))
        iters += 1
        a = c * 0.5 + 0.25
    q.put(iters)


def run_level(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(p)]
    t0 = time.time()
    for pr in procs:
        pr.start()
    tot = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    wall = time.time() - t0
    return tot / p / wall  # iterations/s per core


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [8, 2, 8, 2, 32, 2]
    res: dict[int, list[float]] = {}
    for p in levels:
        load1 = os.getloadavg()[0]
        ips = run_level(p)
        res.setdefault(p, []).append(round(ips, 2))
        print(f"  P={p:2d} per-core {ips:8.2f} it/s (load1 before: {load1:.1f})",
              file=sys.stderr)
    base = max(res.get(2, [1.0]))
    out = {
        "per_core_ips": {str(k): v for k, v in sorted(res.items())},
        "ceiling_2toP": {str(k): round(max(v) / base, 3)
                         for k, v in sorted(res.items()) if k != 2},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
