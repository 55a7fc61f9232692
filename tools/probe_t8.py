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
JOB = os.environ.get("PROBE_JOB", "e2e")  # e2e | docdedup
CLIPS = os.path.join(REPO, "data/audio_scale/audio_clips.parquet")
DOCS = os.path.join(REPO, "data/docs_hot_1600000_5000/documents.parquet")


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

    shuf = os.environ.get("PROBE_SHUF")
    spark = get_spark(f"probe-{CPUS}", parallelism=CPUS,
                      shuffle_partitions=int(shuf) if shuf else None,
                      extra_conf={
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
    # mirror bench.py's analyzer/AQE warmup so probe walls are comparable
    from cdstore_spark.engine.bucket_pairs import capped_bucket_pairs
    tiny = spark.createDataFrame([(1, 0), (1, 1), (2, 0), (2, 1), (2, 2)],
                                 "k int, m int")
    capped_bucket_pairs(tiny, ["k"], "m", cap=2, soft=2).count()

    marks = {}
    if JOB == "docdedup":
        from pyspark.sql import functions as F
        from cdstore_spark.functions import textops as X
        docs = spark.read.parquet(DOCS)
        t0 = time.time()
        with cache_scope():
            pairs = X.minhash_lsh_pairs(docs).persist()
            n_cand = pairs.count()
        marks["pairs"] = (t0, time.time())
        t1 = time.time()
        clus = S_clust.connected_components(
            pairs.select("a", "b"),
            docs.select(F.col("doc_id").alias("clip_id")),
            edges_distinct=True)
        n_clus = clus.count()
        marks["cluster"] = (t1, time.time())
        n = n_conf = 0
        wall = time.time() - t0
    else:
        n, n_cand, n_conf, n_clus, wall = _audio_e2e(
            spark, CFG, S_feat, S_cand, S_verify, S_clust, cache_scope,
            marks)
    _report(spark, marks, n, n_cand, n_conf, n_clus, wall)


def _audio_e2e(spark, CFG, S_feat, S_cand, S_verify, S_clust, cache_scope,
               marks):
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
    return n, n_cand, n_conf, n_clus, wall


def _report(spark, marks, n, n_cand, n_conf, n_clus, wall):
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
    # Spark stages with task times: parallelism holes are stages whose
    # wall is large but task-seconds << CPUS * wall (few/skewed tasks).
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete"))
    st_ivs = []
    for s in stages:
        if "firstTaskLaunchedTime" not in s or "completionTime" not in s:
            continue
        a = iso_ms(s["firstTaskLaunchedTime"])
        b = iso_ms(s["completionTime"])
        st_ivs.append((a, b, s.get("numCompleteTasks", 0),
                       (s.get("executorRunTime", 0) or 0) / 1000.0,
                       s["stageId"], (s.get("name") or "")[:70]))
    st_ivs.sort()

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
        # utilization: task-seconds within this pipeline stage vs CPUS*wall
        ssub = [s4 for s4 in st_ivs if s4[0] >= a - 0.5 and s4[1] <= b + 0.5]
        task_s = sum(s4[3] for s4 in ssub)
        print(f"   util: task-s {task_s:8.1f} / ({CPUS}x{stage_wall:.1f}) "
              f"= {task_s / (CPUS * stage_wall):.2f}")
        # low-parallelism holes: rank Spark stages by wall * (1 - util)
        holes = []
        for s4 in ssub:
            sw = s4[1] - s4[0]
            if sw < 1.0:
                continue
            sutil = min(1.0, s4[3] / (CPUS * sw))
            holes.append((sw * (1 - sutil), sw, sutil, s4[2], s4[4], s4[5]))
        for waste, sw, sutil, ntask, sid, nm in sorted(holes,
                                                       reverse=True)[:8]:
            print(f"   hole {waste:6.1f}s  stage {sid:4d} wall {sw:6.1f}s "
                  f"util {sutil:.2f} tasks {ntask:4d}  {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
