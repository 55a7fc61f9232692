#!/usr/bin/env python
"""Instrumented local[8] scale-tier e2e probe: runs the same four stages
as bench.py's e2e worker with the Spark UI enabled, then pulls
/api/v1/applications jobs to decompose wall into (a) concurrent-job
execution time and (b) DRIVER-SERIAL gaps where no job was running —
the quantity that caps the N->4N ladder (round-4 diagnosis method).

Prints per-pipeline-stage: wall, job-covered time, gap time, plus the
top individual gaps with the job names that bracket them.
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


def iso_ms(s: str) -> float:
    from datetime import datetime
    return datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    from cdstore_spark.config import DEFAULT as CFG
    from cdstore_spark.engine import candidates as S_cand
    from cdstore_spark.engine import cluster as S_clust
    from cdstore_spark.engine import featurize as S_feat
    from cdstore_spark.engine import verify as S_verify
    from cdstore_spark.engine.scope import cache_scope
    from cdstore_spark.engine.session import get_spark

    spark = get_spark(f"probe-{CPUS}", parallelism=CPUS, extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4099",
        "spark.cleaner.referenceTracking": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        from cdstore_spark.kernels import (clipfeat, codec,  # noqa: F401
                                           features, sketch, suffix, text)
        yield from batches

    (spark.range(CPUS * 4).repartition(CPUS)
     .mapInPandas(_warm, "id long").count())

    marks = {}
    t0 = time.time()
    feats = S_feat.featurize_from_parquet(spark, CLIPS, CFG).persist()
    n = feats.count()
    marks["featurize"] = (t0, time.time())
    t1 = time.time()
    with cache_scope():
        cand, _ = S_cand.candidate_pairs(feats, CFG)
        cand = cand.persist()
        n_cand = cand.count()
    marks["candidates"] = (t1, time.time())
    t1 = time.time()
    with cache_scope():
        conf = S_verify.verify_candidates(cand, feats, CFG, n_feats=n,
                                          n_cand=n_cand).persist()
        n_conf = conf.count()
    marks["verify"] = (t1, time.time())
    t1 = time.time()
    clips = spark.read.parquet(CLIPS)
    clus = S_clust.connected_components(conf.select("a", "b"),
                                        clips.select("clip_id"),
                                        edges_distinct=True)
    n_clus = clus.count()
    marks["cluster"] = (t1, time.time())
    wall = time.time() - t0

    base = "http://localhost:4099/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    jobs = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/jobs?status=succeeded"))
    ivs = []
    for j in jobs:
        if "submissionTime" not in j or "completionTime" not in j:
            continue
        ivs.append((iso_ms(j["submissionTime"]),
                    iso_ms(j["completionTime"]),
                    j["jobId"], (j.get("name") or "")[:90]))
    ivs.sort()

    print(json.dumps({"rows": n, "cand": n_cand, "conf": n_conf,
                      "clusters": n_clus, "wall_s": round(wall, 1)}))
    for st, (a, b) in marks.items():
        sub = [iv for iv in ivs if iv[0] >= a - 0.5 and iv[1] <= b + 0.5]
        # merge job intervals -> covered time
        merged = []
        for s, e, *_ in sub:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged)
        stage_wall = b - a
        print(f"\n== {st}: wall {stage_wall:.1f}s covered {covered:.1f}s "
              f"gaps {stage_wall - covered:.1f}s ({len(sub)} jobs)")
        # gaps between consecutive merged intervals (and leading gap)
        gaps = []
        prev = a
        for s, e in merged:
            if s - prev > 0.4:
                after = next((n4 for s4, e4, j4, n4 in sub
                              if abs(s4 - s) < 0.01), "?")
                gaps.append((s - prev, prev - a, after))
            prev = max(prev, e)
        if b - prev > 0.4:
            gaps.append((b - prev, prev - a, "(end of stage)"))
        for g, off, nm in sorted(gaps, reverse=True)[:8]:
            print(f"   gap {g:6.1f}s at +{off:7.1f}s before job: {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
