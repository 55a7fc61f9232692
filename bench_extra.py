#!/usr/bin/env python
"""Per-query profiling harness (guide §1: measure first) — NOT the graded
bench. Mirrors bench.py's headline-query block in one warm session with the
Spark UI enabled, labels each query (setJobDescription), times it with the
noop sink, and decomposes each query's wall into job-covered time vs
driver-serial gaps via the UI REST API. Optionally dumps
.explain("formatted") per query to plans/<tag>/<query>.txt.

Usage:
  python bench_extra.py [query ...]        # default: the bench's 12 + extras
  PROFILE_PLANS_DIR=plans/r06 python bench_extra.py   # also dump plans
  PROFILE_REPEAT=2 python bench_extra.py   # time each query N times
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI = "http://localhost:4098/api/v1"

BENCH_QUERIES = [
    "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q5_region_revenue",
    "dedup_jaccard_docs", "dedup_minhash_lsh_docs", "doc_dedup_clusters",
    "ann_topk_cosine", "ann_ivf_topk", "lang_id_docs",
    "gram_df_stats_docs", "text_quality_docs", "events_user_daily",
]


def _spark():
    from cdstore_spark.engine.session import get_spark
    s = get_spark(f"profile-{CPUS}", parallelism=CPUS, extra_conf={
        "spark.cleaner.referenceTracking": "false",
        "spark.ui.enabled": "true",
        "spark.ui.port": "4098",
    })
    s.sparkContext.setLogLevel("ERROR")
    s.range(10000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        from cdstore_spark.kernels import (clipfeat, codec, features,  # noqa: F401
                                           sketch, suffix, text)
        yield from batches

    (s.range(CPUS * 4).repartition(CPUS).mapInPandas(_warm, "id long").count())
    from cdstore_spark.engine.bucket_pairs import capped_bucket_pairs
    tiny = s.createDataFrame([(1, 0), (1, 1), (2, 0), (2, 1), (2, 2)],
                             "k int, m int")
    capped_bucket_pairs(tiny, ["k"], "m", cap=2, soft=2).count()
    return s


def _jobs() -> list[dict]:
    with urllib.request.urlopen(f"{UI}/applications") as r:
        apps = json.load(r)
    app = apps[0]["id"]
    with urllib.request.urlopen(f"{UI}/applications/{app}/jobs") as r:
        return json.load(r)


def _iso(sv: str) -> float:
    from datetime import datetime
    return datetime.strptime(sv[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def _job_cover(jobs: list[dict], t0: float, t1: float) -> tuple[float, int]:
    """Total wall covered by >=1 running job within [t0, t1], n jobs."""
    iv = []
    for j in jobs:
        if "submissionTime" not in j:
            continue
        s = _iso(j["submissionTime"])
        e = _iso(j.get("completionTime", j["submissionTime"]))
        s, e = max(s, t0), min(e, t1)
        if e > s:
            iv.append((s, e))
    iv.sort()
    cov, cur_s, cur_e, n = 0.0, None, None, len(iv)
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                cov += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        cov += cur_e - cur_s
    return cov, n


def main() -> None:
    import __spark_entry__ as E

    names = sys.argv[1:] or BENCH_QUERIES
    repeat = int(os.environ.get("PROFILE_REPEAT", "1"))
    plans_dir = os.environ.get("PROFILE_PLANS_DIR")
    spark = _spark()
    qs = E.queries()
    out = {}
    for name in names:
        walls = []
        for it in range(repeat):
            spark.sparkContext.setJobDescription(f"q:{name}#{it}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.count()
            t1 = time.time()
            walls.append(round(t1 - t0, 2))
            try:
                jobs = _jobs()
                cov, nj = _job_cover(jobs, t0, t1)
            except Exception:
                cov, nj = -1.0, -1
            print(f"profile: {name}#{it} wall={walls[-1]}s "
                  f"job-covered={cov:.2f}s gaps={t1 - t0 - cov:.2f}s "
                  f"jobs~{nj}", file=sys.stderr, flush=True)
            if plans_dir and it == 0:
                os.makedirs(plans_dir, exist_ok=True)
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                    .fromString("formatted")
                plan = df._jdf.queryExecution().explainString(mode)
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
        spark.sparkContext.setJobDescription(None)
        out[name] = walls
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
