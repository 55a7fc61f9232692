"""Checkpoint/resume semantics (SURVEY.md §5.2.5, north rule: a killed job
resumes mid-pipeline without recomputing completed partitions)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from cdstore_spark import golden
from cdstore_spark.engine import featurize as S_feat
from cdstore_spark.engine.snapshot import StageCheckpoint, chunk_filter

N_CHUNKS = 3


def _featurize_stage(spark, clips, workdir):
    from cdstore_spark.config import DEFAULT
    ck = StageCheckpoint(workdir, "s2_features", N_CHUNKS)
    df = ck.run(
        spark,
        lambda i: S_feat.featurize(
            clips.where(chunk_filter("clip_id", N_CHUNKS, i)), DEFAULT),
        hash_cols_for_lineage=["clip_id", "pcm_sha256"])
    return ck, df


@pytest.fixture(scope="module")
def small_clips(spark, smoke_golden):
    return (S_feat.load_clips(spark, golden.clips_path("smoke"))
            .limit(150).cache())


def _value_hash(ck):
    return sorted((e["chunk"], e["rows"], e["value_hash"])
                  for e in ck.lineage())


class TestResume:
    def test_fresh_run_then_noop_rerun(self, spark, small_clips, tmp_path):
        wd = str(tmp_path / "wd")
        ck1, _ = _featurize_stage(spark, small_clips, wd)
        assert ck1.last_recomputed_chunks == N_CHUNKS
        h1 = _value_hash(ck1)

        ck2, df2 = _featurize_stage(spark, small_clips, wd)
        assert ck2.last_recomputed_chunks == 0       # nothing recomputed
        assert _value_hash(ck2) == h1
        assert df2.count() == 150

    def test_kill_mid_pipeline_resumes_missing_chunk_only(
            self, spark, small_clips, tmp_path):
        wd = str(tmp_path / "wd2")
        ck1, _ = _featurize_stage(spark, small_clips, wd)
        h1 = _value_hash(ck1)

        # simulate a kill after chunk 0+2 committed but chunk 1 lost
        os.remove(ck1._entry_path(1))
        shutil.rmtree(os.path.join(ck1.dir, "chunk=1"))

        ck2, df2 = _featurize_stage(spark, small_clips, wd)
        assert ck2.last_recomputed_chunks == 1       # only the missing chunk
        assert _value_hash(ck2) == h1                # byte-identical output
        assert df2.count() == 150

    def test_lineage_records_partitions_and_metrics(self, spark, small_clips,
                                                    tmp_path):
        wd = str(tmp_path / "wd3")
        ck, _ = _featurize_stage(spark, small_clips, wd)
        lin = ck.lineage()
        assert len(lin) == N_CHUNKS
        for e in lin:
            assert e["rows"] > 0
            assert e["wall_ms"] > 0
            assert sum(p["rows"] for p in e["partitions"]) == e["rows"]
