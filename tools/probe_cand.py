#!/usr/bin/env python
"""Task-level skew probe for the candidates stage at local[8].

Runs featurize (persisted) + candidate_pairs on the scale tier with the
Spark UI on, then for every Spark stage in the candidates window prints
task-duration quantiles — separating wave quantization (uniform tasks,
poor tail) from data skew (straggler tasks) so the fix targets the real
cause (round-5: stage '34' measured util 0.60 over 17.9 s / 73 tasks).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("PROBE_CPUS", "8"))
CLIPS = os.path.join(REPO, "data/audio_scale/audio_clips.parquet")


def main() -> None:
    from cdstore_spark.config import DEFAULT as CFG
    from cdstore_spark.engine import candidates as S_cand
    from cdstore_spark.engine import featurize as S_feat
    from cdstore_spark.engine.scope import cache_scope
    from cdstore_spark.engine.session import get_spark

    spark = get_spark(f"probe-cand-{CPUS}", parallelism=CPUS, extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4099",
    })
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        from cdstore_spark.kernels import features  # noqa: F401
        yield from batches

    (spark.range(CPUS * 4).repartition(CPUS)
     .mapInPandas(_warm, "id long").count())

    feats = S_feat.featurize_from_parquet(spark, CLIPS, CFG).persist()
    n = feats.count()
    t0 = time.time()
    with cache_scope():
        cand, _ = S_cand.candidate_pairs(feats, CFG)
        cand = cand.persist()
        n_cand = cand.count()
    wall = time.time() - t0
    print(json.dumps({"rows": n, "cand": n_cand, "wall_s": round(wall, 1)}))

    base = "http://localhost:4099/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete"))
    from datetime import datetime

    def iso(s):
        return datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for s in stages:
        if "firstTaskLaunchedTime" not in s or "completionTime" not in s:
            continue
        a, b = iso(s["firstTaskLaunchedTime"]), iso(s["completionTime"])
        if a < t0 - 0.5:   # featurize/warmup stages
            continue
        rows.append((b - a, s))
    print("\nall candidate-window stages (id, wall, tasks, input/shuffle):")
    for sw, s in sorted(rows, key=lambda r: r[1]["stageId"]):
        print(f"  {s['stageId']:4d} wall {sw:6.1f}s tasks "
              f"{s.get('numCompleteTasks', 0):4d} "
              f"inRec {s.get('inputRecords', 0):>10} "
              f"sRdRec {s.get('shuffleReadRecords', 0):>10} "
              f"sWrRec {s.get('shuffleWriteRecords', 0):>10} "
              f"sWrMB {s.get('shuffleWriteBytes', 0) / 1e6:8.1f}")
    for sw, s in sorted(rows, reverse=True)[:6]:
        sid = s["stageId"]
        q = json.load(urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages/{sid}/0/taskSummary"
            "?quantiles=0.0,0.5,0.9,0.99,1.0"))
        tasks = json.load(urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages/{sid}/0/taskList"
            "?length=5000&sortBy=-runtime"))
        durs = sorted((t.get("duration", 0) / 1000.0 for t in tasks),
                      reverse=True)
        run_s = (s.get("executorRunTime", 0) or 0) / 1000.0
        print(f"\nstage {sid} wall {sw:6.1f}s tasks {len(durs)} "
              f"run {run_s:7.1f}s util {run_s / (CPUS * sw):.2f} "
              f"name {(s.get('name') or '')[:60]}")
        print(f"  top task durations: "
              f"{[round(d, 1) for d in durs[:10]]}")
        print(f"  duration quantiles: "
              f"{[round(x / 1000.0, 2) for x in q['duration']]}")
        det = (s.get("details") or "").split("\n")
        callers = [ln for ln in det if "cdstore_spark" in ln][:3]
        for c in callers:
            print(f"  at {c.strip()[:110]}")
        for t in tasks[:6]:
            tm = t.get("taskMetrics") or {}
            srm = tm.get("shuffleReadMetrics") or {}
            swm = tm.get("shuffleWriteMetrics") or {}
            print(f"    task {t.get('taskId'):5} dur "
                  f"{t.get('duration', 0) / 1000.0:6.1f}s "
                  f"rdRec {srm.get('recordsRead', 0):>9} "
                  f"wrRec {swm.get('recordsWritten', 0):>9} "
                  f"wrMB {swm.get('bytesWritten', 0) / 1e6:7.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
