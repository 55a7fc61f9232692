#!/usr/bin/env python
"""Same-window N→4N ladder harvest (round-5 verdict tasks #1/#2).

Repeatedly measures an INTERLEAVED local[2]/local[8] pair of the same job
on the same input — the only arrangement in which the efficiency ratio is
a measurement of one host window rather than a quotient of two unrelated
ones. Each sample:

  * waits for a quiet 1-min loadavg (ambient interference is visible in
    this VM's idle loadavg; a loud window cannot produce a valid pair),
  * runs T8 then T2 back-to-back in fresh JVM subprocesses — FIXED
    order, noise-sensitive level first: T8 is the level whose wall a
    loud window distorts most (it shares cores with ambient load the
    soonest), so it runs while the just-verified quiet gate still holds;
    the recorded order=[8,2] field documents this per pair,
  * asserts the result hash is identical across levels (bit-identical
    outputs or the pair is discarded as broken, not noisy),
  * appends the pair to bench_history.jsonl and prints the efficiency.

Stops once `need` consecutive pairs clear the 0.8 bar, or iters run out.

Usage:
  python tools/harvest_ladder.py e2e_scale   [iters] [max_load] [need]
  python tools/harvest_ladder.py docdedup    [iters] [max_load] [need]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = {
    # job key in bench_history.jsonl: (worker task, input path, hash key)
    "e2e_scale": ("e2e", os.path.join(REPO, "data/audio_scale/"
                                      "audio_clips.parquet"),
                  "confirmed_hash"),
    "docdedup": ("docdedup", os.path.join(REPO, "data/docs_hot_"
                                          "1600000_5000/documents.parquet"),
                 "pairs_hash"),
}
HIST = os.path.join(REPO, "bench_history.jsonl")
HIST_JOB = {"e2e_scale": "e2e_scale", "docdedup": "docdedup_scale"}

job = sys.argv[1] if len(sys.argv) > 1 else "e2e_scale"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
max_load = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
need = int(sys.argv[4]) if len(sys.argv) > 4 else 2
QUIET_WAIT_MAX_S = 900.0

what, path, hkey = JOBS[job]


def wait_quiet(budget_s: float) -> float:
    t0 = time.time()
    while time.time() - t0 < budget_s:
        load1 = os.getloadavg()[0]
        if load1 <= max_load:
            return load1
        time.sleep(30)
    return os.getloadavg()[0]


def _busy_cores() -> tuple[float, float, float]:
    """(busy, total, steal) jiffies across all CPUs from /proc/stat.
    steal is the hypervisor-co-tenant interference loadavg cannot see —
    this VM has averaged ~0.65 stolen cores over its uptime, spiking
    during exactly the windows that inflate identical-config runs."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [float(x) for x in parts[1:11]]
    idle = vals[3] + vals[4]          # idle + iowait
    return sum(vals) - idle, sum(vals), vals[7]


def run_level(cpus: int) -> tuple[dict | None, float, float, float]:
    """Run one level; poll 1-min loadavg every 20 s while it runs and
    return (result, max ambient estimate, mean busy cores, hypervisor
    steal share) where ambient = load1 - cpus (our own job's
    contribution). The DURING-run maximum
    is the cleanliness metric — a gate read before the run sees a decayed
    average and misses spikes that start seconds later. Mean busy cores
    (from /proc/stat deltas) records the hardware regime the level ran
    in: a local[8] Spark job keeps JVM threads AND Python workers
    runnable, so its busy-core count sits ABOVE 8 — further down this
    VM's frequency-scaling curve than 'local[8]' suggests."""
    out = f"/tmp/ladder_{job}_{cpus}.json"
    b0, t0j, s0 = _busy_cores()
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"), "--worker",
         str(cpus), what, path, out],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    amb_max = 0.0
    while p.poll() is None:
        amb_max = max(amb_max, os.getloadavg()[0] - cpus)
        time.sleep(20)
    b1, t1j, s1 = _busy_cores()
    ncpu = os.cpu_count() or 32
    denom = max(t1j - t0j, 1e-9)
    busy = (b1 - b0) / denom * ncpu
    steal = (s1 - s0) / denom * ncpu
    if p.returncode != 0:
        print(f"  worker local[{cpus}] failed rc={p.returncode}",
              flush=True)
        return None, amb_max, busy, steal
    with open(out) as f:
        return json.load(f), amb_max, busy, steal


# Ambient cleanliness matters ASYMMETRICALLY on this VM: per-core clock
# drops ~35% once more than ~8 cores are busy, so ambient load that
# coexists harmlessly with the local[2] run pushes the local[8] run over
# the clock knee — inflating T8 and DEFLATING measured efficiency (an
# interleaved pair whose T8 half caught a spike measured 0.625 with T2
# at its all-time fastest). So: the noise-SENSITIVE level (8) always
# runs FIRST, immediately after the quiet gate passes, and loadavg is
# polled DURING each level (a pre-run gate reads a decayed average and
# misses spikes that start seconds later). Pairs count toward the
# streak only if both levels ran with max ambient <= AMBIENT_CLEAN.
AMBIENT_CLEAN = 1.5

streak = 0
for i in range(iters):
    res: dict[int, dict] = {}
    amb: dict[int, float] = {}
    busy: dict[int, float] = {}
    steal: dict[int, float] = {}
    t0 = time.time()
    ok = True
    for cpus in (8, 2):
        wait_quiet(QUIET_WAIT_MAX_S)
        r, a, bc, st = run_level(cpus)
        if r is None:
            ok = False
            break
        res[cpus] = r
        amb[cpus] = a
        busy[cpus] = bc
        steal[cpus] = st
    if not ok:
        time.sleep(60)
        continue
    assert res[2][hkey] == res[8][hkey], (res[2][hkey], res[8][hkey])
    eff = (res[2]["wall_s"] / res[8]["wall_s"]) / 4
    clean = all(a <= AMBIENT_CLEAN for a in amb.values())
    with open(HIST, "a") as f:
        f.write(json.dumps({
            "job": HIST_JOB[job],
            "wall_s": {"2": round(res[2]["wall_s"], 2),
                       "8": round(res[8]["wall_s"], 2)},
            "pair": True, "order": [8, 2], "clean": clean,
            "ambient_max": {str(c): round(v, 1)
                            for c, v in amb.items()},
            "busy_cores": {str(c): round(v, 1)
                           for c, v in busy.items()},
            "steal_cores": {str(c): round(v, 2)
                            for c, v in steal.items()},
            "eff_2to8": round(eff, 3)}) + "\n")
    streak = streak + 1 if (eff >= 0.8 and clean) else \
        (streak if eff >= 0.8 else 0)
    print(f"[{i}] {job} T2={res[2]['wall_s']:.1f}s T8="
          f"{res[8]['wall_s']:.1f}s eff={eff:.3f} clean={clean} "
          f"ambient_max={amb} busy={busy} steal={steal} streak={streak} "
          f"(pair took {time.time() - t0:.0f}s) "
          f"stages2={res[2].get('stages')} stages8={res[8].get('stages')}",
          flush=True)
    if streak >= need:
        print(f"done: {need} consecutive clean pairs >= 0.8", flush=True)
        break
    time.sleep(60)
