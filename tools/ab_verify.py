#!/usr/bin/env python
"""Interleaved A/B of verify-stage shuffle width at the 400k tier.

One session, feats+cand built once; verify_candidates re-run alternating
spark.sql.shuffle.partitions (AQE reads it per-query), order ABBA BAAB to
cancel drift and kernel-memo warmup. Prints wall + the confirmed count
(must be identical every run).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("PROBE_CPUS", "8"))
CLIPS = os.path.join(REPO, "data/audio_scale/audio_clips.parquet")
A = os.environ.get("AB_A", "32")
B = os.environ.get("AB_B", "64")


def main() -> None:
    from cdstore_spark.config import DEFAULT as CFG
    from cdstore_spark.engine import candidates as S_cand
    from cdstore_spark.engine import featurize as S_feat
    from cdstore_spark.engine import verify as S_verify
    from cdstore_spark.engine.scope import cache_scope
    from cdstore_spark.engine.session import get_spark

    spark = get_spark(f"abverify-{CPUS}", parallelism=CPUS, extra_conf={
        "spark.cleaner.referenceTracking": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        from cdstore_spark.kernels import (clipfeat, codec,  # noqa: F401
                                           features, sketch, suffix, text)
        yield from batches

    (spark.range(CPUS * 4).repartition(CPUS)
     .mapInPandas(_warm, "id long").count())

    feats = S_feat.featurize_from_parquet(spark, CLIPS, CFG).persist()
    n = feats.count()
    with cache_scope():
        cand, _ = S_cand.candidate_pairs(feats, CFG)
        cand = cand.persist()
        n_cand = cand.count()
    print(f"setup done: {n} feats, {n_cand} cand", flush=True)

    def run(shuf: str) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", shuf)
        t0 = time.time()
        with cache_scope():
            conf = S_verify.verify_candidates(cand, feats, CFG, n_feats=n,
                                              n_cand=n_cand)
            n_conf = conf.count()
        w = time.time() - t0
        print(f"  shuf={shuf}: {w:7.1f}s conf={n_conf} "
              f"load1={os.getloadavg()[0]:.1f}", flush=True)
        return w

    run(A)  # warm kernel memos / page cache once, untimed comparison-wise
    seq = [A, B, B, A, B, A, A, B]
    walls: dict[str, list[float]] = {A: [], B: []}
    for sh in seq:
        walls[sh].append(run(sh))
    import statistics
    for sh in (A, B):
        print(f"shuf={sh}: min {min(walls[sh]):.1f} "
              f"median {statistics.median(walls[sh]):.1f} {walls[sh]}")
    spark.stop()


if __name__ == "__main__":
    main()
