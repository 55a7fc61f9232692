"""Datagen determinism + oracle quality gates (SURVEY.md §5.2.3)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from cdstore_spark import datagen


class TestDatagen:
    def test_spec_deterministic(self):
        s1 = datagen.build_spec(300, 15)
        s2 = datagen.build_spec(300, 15)
        pd.testing.assert_frame_equal(s1, s2)

    def test_synth_deterministic(self):
        spec = datagen.build_spec(40, 3)
        c1 = datagen.synth_batch(spec)
        c2 = datagen.synth_batch(spec)
        assert (c1["bytes"] == c2["bytes"]).all()

    def test_schema_contract(self):
        clips, _ = datagen.generate_local(50, 3)
        assert list(clips.columns) == ["clip_id", "bytes", "sr_hz", "dur_ms",
                                       "codec", "transcript"]
        assert clips["sr_hz"].dtype == np.int32
        assert clips["dur_ms"].dtype == np.int32
        n = clips["bytes"].str.len()
        # dur_ms consistent with payload length per codec
        for _, r in clips.iterrows():
            ns = len(r["bytes"]) // (2 if r["codec"] == "pcm_s16le" else 1)
            assert abs(ns - r["sr_hz"] * r["dur_ms"] / 1000) <= r["sr_hz"] // 100

    def test_blocks_present(self):
        spec = datagen.build_spec(1000, 50)
        kinds = spec["kind"].value_counts()
        assert kinds.get("silence", 0) == 30
        assert kinds.get("template", 0) == 20
        assert kinds.get("base", 0) > 0


class TestOracleQuality:
    """The frozen-golden quality metrics ARE the north-rule gates."""

    def test_smoke_golden_metrics(self, smoke_golden):
        with open(os.path.join(smoke_golden, "_GOLDEN_DONE.json")) as f:
            m = json.load(f)
        assert m["recall"] >= 0.99
        assert m["hard_negative_hits"] == 0

    def test_template_block_single_cluster(self, smoke_golden):
        clus = pd.read_parquet(os.path.join(smoke_golden,
                                            "expected_clusters.parquet"))
        clips = pd.read_parquet(os.path.join(smoke_golden,
                                             "audio_clips.parquet"))
        spec = datagen.build_spec(1000, 50)
        tmpl = spec[spec["kind"] == "template"]["clip_id"]
        cm = dict(zip(clus["clip_id"], clus["cluster_id"]))
        assert len({cm[c] for c in tmpl}) == 1

    def test_silence_clips_are_singletons(self, smoke_golden):
        clus = pd.read_parquet(os.path.join(smoke_golden,
                                            "expected_clusters.parquet"))
        spec = datagen.build_spec(1000, 50)
        sil = spec[spec["kind"] == "silence"]["clip_id"]
        cm = dict(zip(clus["clip_id"], clus["cluster_id"]))
        sizes = clus.groupby("cluster_id").size()
        assert all(sizes[cm[c]] == 1 for c in sil)


class TestHotDocsCorpus:
    """docgen.ensure_hot_docs — the planted-hot-group bench corpus."""

    def test_deterministic_and_self_healing(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from cdstore_spark.docgen import ensure_hot_docs

        root = str(tmp_path)
        p1 = ensure_hot_docs(n=60, hot=10, data_root=root)
        t1 = pq.read_table(p1)
        assert t1.num_rows == 60
        texts = t1.column("text").to_pylist()
        # exactly one 10-member exact-duplicate text group
        from collections import Counter
        top = Counter(texts).most_common(1)[0]
        assert top[1] == 10
        # cache hit returns the same bytes
        mtime = os.path.getmtime(p1)
        assert ensure_hot_docs(n=60, hot=10, data_root=root) == p1
        assert os.path.getmtime(p1) == mtime
        # self-heal: a surviving marker with a missing parquet regenerates
        os.unlink(p1)
        p2 = ensure_hot_docs(n=60, hot=10, data_root=root)
        t2 = pq.read_table(p2)
        assert t2.column("text").to_pylist() == texts  # seeded => identical
