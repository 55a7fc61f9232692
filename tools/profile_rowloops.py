#!/usr/bin/env python
"""Measure the per-row-within-batch loop overhead of the five Arrow-batch
kernels the round-4 verdict flagged (textops doc_signatures /
lang_trigram_counts / doc_fingerprints; multimodal frame_sample_audio /
resample_audio_stats).

Method: each flagged site is a Python for-loop whose BODY is a vectorized
NumPy kernel call. The quantity that would justify batching the kernel
across rows is the loop's interpreter overhead — iteration, str()/astype
coercion, list bookkeeping — NOT the kernel math (which runs at NumPy
speed either way). We time each loop twice over identical inputs:

    T_full     loop exactly as the operator runs it (kernel included)
    T_overhead same loop with the kernel call replaced by a no-op,
               keeping every coercion and bookkeeping step

overhead_frac = T_overhead / T_full. Under 5% means a cross-row batched
rewrite of the kernel could recover at most that fraction of the stage's
Python time — document and move on (BENCH.md carries the numbers).

Inputs: the real contract tables (sf documents; correctness-tier clips).
Pure single-process NumPy/pandas — no Spark session.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 3


def _best(fn, *args):
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from cdstore_spark import golden
    from cdstore_spark.config import DEFAULT as cfg
    from cdstore_spark.kernels import codec as K_codec
    from cdstore_spark.kernels import features as K_feat
    from cdstore_spark.kernels import sketch as K_sketch
    from cdstore_spark.kernels import text as K_text

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")
                         ).to_pandas()
    golden.ensure_clips("correctness")
    clips = pq.read_table(golden.clips_path("correctness")).to_pandas() \
        .head(2000)
    texts = docs["text"].to_numpy()
    out: dict[str, dict] = {}

    # ---- doc_signatures (textops.py): ngram_shingles per doc ------------
    def sig_full():
        sh = [K_text.ngram_shingles(str(t), cfg.text_ngram, short_tokens=0)
              for t in texts]
        offs = np.zeros(len(sh) + 1, dtype=np.int64)
        np.cumsum([a.shape[0] for a in sh], out=offs[1:])
        vals = (np.concatenate(sh) if sh else
                np.empty(0, np.uint64)).astype(np.uint64, copy=False)
        K_sketch.band_hashes(K_sketch.minhash_batch(vals, offs, cfg), cfg)
        K_sketch.simhash_batch(vals, offs, cfg)

    _EMPTY_U64 = np.empty(0, np.uint64)

    def sig_overhead():
        sh = [(str(t), _EMPTY_U64)[1] for t in texts]   # coercion kept
        offs = np.zeros(len(sh) + 1, dtype=np.int64)
        np.cumsum([a.shape[0] for a in sh], out=offs[1:])
        (np.concatenate(sh) if sh else
         np.empty(0, np.uint64)).astype(np.uint64, copy=False)

    out["doc_signatures"] = {"rows": len(texts),
                             "full_s": _best(sig_full),
                             "overhead_s": _best(sig_overhead)}

    # ---- lang_trigram_counts: char_trigram_hashes per doc ---------------
    lvals = docs["lang"].astype(str).to_numpy()

    def tri_full():
        langs, tris = [], []
        for i, t in enumerate(texts):
            u = np.unique(K_text.char_trigram_hashes(str(t)))
            langs.extend([lvals[i]] * u.shape[0])
            tris.append(u.view(np.int64))
        np.concatenate(tris) if tris else np.empty(0, np.int64)

    _EMPTY_I64 = np.empty(0, np.int64)

    def tri_overhead():
        langs, tris = [], []
        for i, t in enumerate(texts):
            u = (str(t), _EMPTY_I64)[1]
            langs.extend([lvals[i]] * u.shape[0])
            tris.append(u)
        np.concatenate(tris) if tris else np.empty(0, np.int64)

    out["lang_trigram_counts"] = {"rows": len(texts),
                                  "full_s": _best(tri_full),
                                  "overhead_s": _best(tri_overhead)}

    # ---- doc_fingerprints: winnow_fingerprints per doc -------------------
    dids = docs["doc_id"].to_numpy()

    def fp_full():
        ids, fps = [], []
        for i, t in enumerate(texts):
            w = K_text.winnow_fingerprints(str(t))
            ids.extend([dids[i]] * w.shape[0])
            fps.append(w)
        np.concatenate(fps) if fps else np.empty(0, np.int64)

    def fp_overhead():
        ids, fps = [], []
        for i, t in enumerate(texts):
            w = (str(t), _EMPTY_I64)[1]
            ids.extend([dids[i]] * w.shape[0])
            fps.append(w)
        np.concatenate(fps) if fps else np.empty(0, np.int64)

    out["doc_fingerprints"] = {"rows": len(texts),
                               "full_s": _best(fp_full),
                               "overhead_s": _best(fp_overhead)}

    # ---- frame_sample_audio: decode + frame RMS/peak per clip -----------
    srs = clips["sr_hz"].to_numpy()
    codecs = clips["codec"].to_numpy()
    cids = clips["clip_id"].to_numpy()
    raws = clips["bytes"].to_numpy()

    def frame_full():
        ids, idxs, rmss, peaks = [], [], [], []
        for i, raw in enumerate(raws):
            x = K_codec.decode_float(raw, str(codecs[i]))
            rms, peak = K_feat.frame_rms_peak(x, int(srs[i]), 100)
            if rms.shape[0] == 0:
                continue
            ids.extend([cids[i]] * rms.shape[0])
            idxs.extend(range(rms.shape[0]))
            rmss.extend(rms)
            peaks.extend(peak)

    _EMPTY_F32 = np.empty(0, np.float32)

    def frame_overhead():
        ids, idxs, rmss, peaks = [], [], [], []
        for i, raw in enumerate(raws):
            rms = (str(codecs[i]), int(srs[i]), _EMPTY_F32)[2]
            if rms.shape[0] == 0:
                continue

    out["frame_sample_audio"] = {"rows": len(raws),
                                 "full_s": _best(frame_full),
                                 "overhead_s": _best(frame_overhead)}

    # ---- resample_audio_stats: decode + resample per clip ---------------
    def rs_full():
        recs = []
        for cid, raw, sr, codec in zip(cids, raws, srs, codecs):
            x = K_codec.decode_float(raw, str(codec))
            n_out, rms6 = K_codec.resample_stats(x, int(sr), 8000)
            recs.append((cid, int(sr), 8000, n_out, rms6))

    def rs_overhead():
        recs = []
        for cid, raw, sr, codec in zip(cids, raws, srs, codecs):
            s = str(codec)
            recs.append((cid, int(sr), 8000, 0, 0.0))

    out["resample_audio_stats"] = {"rows": len(raws),
                                   "full_s": _best(rs_full),
                                   "overhead_s": _best(rs_overhead)}

    for k, v in out.items():
        v["overhead_frac"] = round(v["overhead_s"] / v["full_s"], 4)
        v["full_s"] = round(v["full_s"], 4)
        v["overhead_s"] = round(v["overhead_s"], 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
