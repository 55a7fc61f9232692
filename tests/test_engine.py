"""Distributed engine vs frozen oracle — exact equality at smoke tier, plus
per-row decode invariants (SNR, transcript passthrough) and the connected-
components algorithm against random graphs (SURVEY.md §5.2.2–4)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cdstore_spark import golden
from cdstore_spark.config import DEFAULT as CFG
from cdstore_spark.engine import cluster as S_clust
from cdstore_spark.engine import featurize as S_feat
from cdstore_spark.engine import pipeline as P
from cdstore_spark.kernels import unionfind


@pytest.fixture(scope="module")
def smoke_run(spark, smoke_golden):
    clips = S_feat.load_clips(spark, golden.clips_path("smoke"))
    out = P.run_pipeline_inline(spark, clips)
    res = {
        "confirmed": out["confirmed"].toPandas(),
        "clusters": out["clusters"].toPandas(),
        "feats": out["feats"].select(
            "clip_id", "n_samples", "rms", "pcm_sha256",
            "transcript").toPandas(),
        "skew": out["skew_stats"].toPandas(),
    }
    out["feats"].unpersist()
    return res


class TestEngineMatchesOracle:
    def test_confirmed_pairs_equal(self, smoke_run, smoke_golden):
        exp = pd.read_parquet(os.path.join(smoke_golden,
                                           "expected_pairs.parquet"))
        got = smoke_run["confirmed"]
        se = set(map(tuple, exp[["a", "b"]].values))
        sg = set(map(tuple, got[["a", "b"]].values))
        assert se == sg
        # dup-pair recall vs the reference decisions: exactly 1.0
        assert len(se - sg) == 0

    def test_cluster_assignments_equal(self, smoke_run, smoke_golden):
        exp = (pd.read_parquet(os.path.join(smoke_golden,
                                            "expected_clusters.parquet"))
               .sort_values("clip_id").reset_index(drop=True))
        got = (smoke_run["clusters"]
               .sort_values("clip_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp[["clip_id", "cluster_id"]])

    def test_decode_bit_exact_and_snr(self, smoke_run, smoke_golden):
        exp = pd.read_parquet(os.path.join(smoke_golden,
                                           "expected_pcm_stats.parquet"))
        got = smoke_run["feats"]
        m = got.merge(exp, on="clip_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp)
        # engine decode is bit-identical to the oracle decode → SNR = inf,
        # which trivially satisfies the >= 30 dB allclose invariant
        assert (m["pcm_sha256_g"] == m["pcm_sha256_e"]).all()
        assert (m["n_samples_g"] == m["n_samples_e"]).all()

    def test_transcript_passthrough(self, smoke_run, smoke_golden):
        clips = pd.read_parquet(os.path.join(smoke_golden,
                                             "audio_clips.parquet"))
        m = smoke_run["feats"].merge(clips[["clip_id", "transcript"]],
                                     on="clip_id", suffixes=("_g", "_e"))
        assert (m["transcript_g"] == m["transcript_e"]).all()

    def test_skew_stats_shape(self, smoke_run):
        s = smoke_run["skew"]
        assert set(s["channel"]) == {"audio", "text"}
        assert (s["max_bucket"] >= 1).all()

    def test_skew_stats_degenerate_empty_channel(self, spark, smoke_golden):
        # a corpus with NO text shingles anywhere: the engine must still
        # emit a zero row for the text channel, exactly like the oracle
        from cdstore_spark import oracle
        from cdstore_spark.engine import candidates as S_cand
        from cdstore_spark.kernels import clipfeat as K_clip
        clips = (pd.read_parquet(os.path.join(smoke_golden,
                                              "audio_clips.parquet"))
                 .head(8).copy())
        clips["transcript"] = ""          # kill the text channel
        exp = (oracle.skew_stats_from_feats(
            K_clip.featurize_batch(clips, CFG), CFG)
            .sort_values("channel").reset_index(drop=True))
        assert (exp[exp["channel"] == "text"]["n_buckets"] == 0).all()
        sdf = S_feat.featurize(spark.createDataFrame(clips), CFG)
        _, skew = S_cand.candidate_pairs(sdf, CFG)
        got = (skew.toPandas().sort_values("channel")
               .reset_index(drop=True).astype(exp.dtypes))
        pd.testing.assert_frame_equal(got, exp)


class TestVerifyShuffleFallback:
    def test_forced_shuffle_plan_matches_broadcast_path(
            self, spark, smoke_golden, monkeypatch):
        """The documented at-scale verify plan — candidate-universe
        semi-join + shuffle joins instead of broadcast builds — must
        produce the IDENTICAL confirmed set. Forced by shrinking the
        broadcast budget to zero, dropping the explicit hints, and
        disabling the session's auto-broadcast thresholds so AQE cannot
        quietly re-broadcast the small sides."""
        from cdstore_spark.engine import candidates as S_cand
        from cdstore_spark.engine import verify as S_verify
        from cdstore_spark.engine.scope import cache_scope

        feats = S_feat.featurize_from_parquet(
            spark, golden.clips_path("smoke"), CFG).persist()
        cand, _ = S_cand.candidate_pairs(feats, CFG)
        cand = cand.persist()
        cand.count()

        def run(**kw):
            with cache_scope():
                df = S_verify.verify_candidates(cand, feats, CFG, **kw)
                pdf = df.toPandas()
                plan = df._jdf.queryExecution().executedPlan().toString()
            key = ["a", "b"]
            return (pdf.sort_values(key).reset_index(drop=True), plan)

        base_pdf, base_plan = run()
        assert "BroadcastHashJoin" in base_plan   # the default fast path
        # default at this tier = the FUSED single-stage path
        assert "FlatMapGroupsInPandas" not in base_plan

        # budget_shares divides the per-invocation broadcast budgets (the
        # concurrent-chunk memory bound): an absurd share count must push
        # strategy selection off the fused/broadcast paths while producing
        # the identical confirmed set
        shared_pdf, _ = run(budget_shares=1 << 30)
        pd.testing.assert_frame_equal(base_pdf, shared_pdf)

        # middle strategy: payloads over budget, slim keys under it —
        # the content-dedup path with broadcast key joins
        monkeypatch.setattr(S_verify, "_PAYLOAD_BROADCAST_MAX_BYTES", -1)
        mid_pdf, mid_plan = run()
        assert "BroadcastHashJoin" in mid_plan
        pd.testing.assert_frame_equal(base_pdf, mid_pdf)

        monkeypatch.setattr(S_verify, "_BROADCAST_MAX_BYTES", 0)
        conf = spark.conf
        keys = ("spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold")
        saved = {k: conf.get(k, None) for k in keys}
        try:
            for k in keys:
                conf.set(k, "-1")
            forced_pdf, forced_plan = run()
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
        assert "BroadcastHashJoin" not in forced_plan, forced_plan[:2000]
        pd.testing.assert_frame_equal(base_pdf, forced_pdf)
        feats.unpersist()
        cand.unpersist()


class TestCacheHygiene:
    def test_no_cache_blocks_survive_scoped_pipeline(self, spark,
                                                     smoke_golden):
        """Scoped persist lifetimes: after a full inline pipeline run whose
        stages materialize inside cache_scope()s (the bench/driver
        pattern), no cached RDD blocks may remain registered — a
        long-lived driver session running many queries must not
        accumulate MEMORY_AND_DISK blocks."""
        from cdstore_spark.engine import candidates as S_cand
        from cdstore_spark.engine import verify as S_verify
        from cdstore_spark.engine.scope import cache_scope

        spark.catalog.clearCache()
        feats = S_feat.featurize_from_parquet(
            spark, golden.clips_path("smoke"), CFG).persist()
        n = feats.count()
        with cache_scope():
            cand, _ = S_cand.candidate_pairs(feats, CFG)
            cand = cand.persist()
            cand.count()
        with cache_scope():
            conf = S_verify.verify_candidates(cand, feats, CFG,
                                              n_feats=n).persist()
            conf.count()
        clips = spark.read.parquet(golden.clips_path("smoke"))
        S_clust.connected_components(
            conf.select("a", "b"), clips.select("clip_id")).count()
        # release the stage outputs the caller owns
        for df in (conf, cand, feats):
            df.unpersist(blocking=True)
        # localCheckpoint RDDs (the CC fixpoint's lineage cuts) are
        # ContextCleaner-managed — they unpersist on GC, not explicitly —
        # so the leak assertion covers everything EXCEPT them
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().toList()
        left = []
        for i in range(it.size()):
            t = it.apply(i)
            if "localCheckpoint" not in t._2().toString():
                left.append((t._1(), t._2().toString()[:120]))
        assert left == [], f"leaked cached RDDs: {left}"


class TestConnectedComponents:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_graph_matches_unionfind(self, spark, seed):
        rng = np.random.default_rng(seed)
        n = 120
        ids = [f"n{i:04d}" for i in range(n)]
        edges = [(ids[rng.integers(0, n)], ids[rng.integers(0, n)])
                 for _ in range(90)]
        edges = [(a, b) for a, b in edges if a != b]
        exp = unionfind.components(edges, ids)
        pairs = spark.createDataFrame(edges, ["a", "b"])
        uni = spark.createDataFrame([(i,) for i in ids], ["clip_id"])
        got = {r["clip_id"]: r["cluster_id"]
               for r in S_clust.connected_components(pairs, uni).collect()}
        assert got == exp

    def test_long_chain(self, spark):
        # a path graph needs the full O(log n) alternation to converge
        ids = [f"c{i:03d}" for i in range(64)]
        edges = list(zip(ids[:-1], ids[1:]))
        pairs = spark.createDataFrame(edges, ["a", "b"])
        uni = spark.createDataFrame([(i,) for i in ids], ["clip_id"])
        got = S_clust.connected_components(pairs, uni).collect()
        assert all(r["cluster_id"] == "c000" for r in got)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_distributed_path_matches_local_finish(self, spark, seed,
                                                   monkeypatch):
        # sub-gate graphs take the driver-side finish by default, so the
        # star rounds must be pinned open (gate=0) to stay covered; both
        # paths and the edges_distinct fast seed must agree with the
        # oracle union-find on the same graph
        rng = np.random.default_rng(100 + seed)
        n = 150
        ids = [f"n{i:04d}" for i in range(n)]
        edges = {(ids[rng.integers(0, n)], ids[rng.integers(0, n)])
                 for _ in range(130)}
        edges = [(a, b) for a, b in edges if a != b]
        exp = unionfind.components(edges, ids)
        pairs = spark.createDataFrame(edges, ["a", "b"])
        uni = spark.createDataFrame([(i,) for i in ids], ["clip_id"])

        monkeypatch.setattr(S_clust, "_LOCAL_FINISH_MAX_EDGES", 0)
        dist = {r["clip_id"]: r["cluster_id"]
                for r in S_clust.connected_components(
                    pairs, uni, edges_distinct=True).collect()}
        assert dist == exp

        monkeypatch.setattr(S_clust, "_LOCAL_FINISH_MAX_EDGES", 1 << 18)
        loc = {r["clip_id"]: r["cluster_id"]
               for r in S_clust.connected_components(
                   pairs, uni, edges_distinct=True).collect()}
        assert loc == exp

    def test_half_round_exit_on_cliques(self, spark, monkeypatch):
        # near-clique graphs contract below the gate after large_star
        # ALONE: gate 64 < the 570 seed edges, but the large_star half
        # (~19 edges per 20-clique) fires the early exit before small_star
        ids = [f"k{i:03d}" for i in range(60)]
        edges = [(ids[g * 20 + i], ids[g * 20 + j])
                 for g in range(3)
                 for i in range(20) for j in range(i + 1, 20)]
        exp = unionfind.components(edges, ids)
        pairs = spark.createDataFrame(edges, ["a", "b"])
        uni = spark.createDataFrame([(i,) for i in ids], ["clip_id"])
        monkeypatch.setattr(S_clust, "_LOCAL_FINISH_MAX_EDGES", 64)
        got = {r["clip_id"]: r["cluster_id"]
               for r in S_clust.connected_components(
                   pairs, uni, edges_distinct=True).collect()}
        assert got == exp

    def test_half_round_probe_without_exit(self, spark, monkeypatch):
        # a path graph contracts slowly: the half probe runs (63 edges is
        # within 16x of gate 4) but does NOT land under the gate, so the
        # loop must continue through small_star rounds to convergence
        ids = [f"p{i:03d}" for i in range(64)]
        edges = list(zip(ids[:-1], ids[1:]))
        pairs = spark.createDataFrame(edges, ["a", "b"])
        uni = spark.createDataFrame([(i,) for i in ids], ["clip_id"])
        monkeypatch.setattr(S_clust, "_LOCAL_FINISH_MAX_EDGES", 4)
        got = S_clust.connected_components(pairs, uni).collect()
        assert all(r["cluster_id"] == "p000" for r in got)
