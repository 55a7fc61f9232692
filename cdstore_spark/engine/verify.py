"""S7: suffix-array span verification of candidate pairs.

Payload discipline (SURVEY.md §7.4 decision 4): verify never touches raw
`bytes` — it consumes the compact event streams + transcripts produced by
featurize, and only for clips that actually appear in a candidate pair
(semi-join first, so at production scale the big feature table is filtered
down to the tiny candidate universe before any wide join).

The pair verification itself is row-independent → mapInPandas (no grouping
shuffle); each Arrow batch loops pairs with the vectorized shared kernel
(suffix array + Kasai per pair, arrays of a few hundred tokens).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, PipelineConfig

VERIFY_SCHEMA = T.StructType([
    T.StructField("a", T.StringType()),
    T.StructField("b", T.StringType()),
    T.StructField("audio_ok", T.BooleanType()),
    T.StructField("text_ok", T.BooleanType()),
    T.StructField("span_ms", T.DoubleType()),
    T.StructField("span_chars", T.IntegerType()),
])

_SIDE_COLS = ["clip_id", "vpack",
              "simhash_audio", "simhash_text", "transcript"]

#: per-side broadcast budget: two broadcasts of the candidate-universe
#: features must stay well under executor memory on a real cluster
_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def verify_candidates(cand: DataFrame, feats: DataFrame,
                      cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Candidate pairs + features → confirmed pairs (audio_ok OR text_ok)."""
    need = (cand.select(F.col("a").alias("clip_id"))
            .unionByName(cand.select(F.col("b").alias("clip_id")))
            .distinct())
    fsub = (feats.select(*_SIDE_COLS)
            .join(need, "clip_id", "leftsemi")
            .localCheckpoint(eager=False))

    # broadcast the candidate-universe features when they fit: the pair
    # table (with its per-side event blobs) is the big side, and two
    # broadcast joins keep it from shuffling at all. The gate is a BYTE
    # estimate of the dominant payload columns, not a row count — 200k
    # rows of multi-KB event streams would blow past executor memory long
    # before a row-count threshold noticed.
    est = fsub.agg(
        (F.sum(F.octet_length("vpack"))
         + F.sum(F.octet_length("transcript"))).alias("bytes")).collect()[0]
    wrap = (F.broadcast if (est["bytes"] or 0) <= _BROADCAST_MAX_BYTES
            else (lambda df: df))

    fa = wrap(fsub.select(*[F.col(c).alias(f"{c}_a" if c != "clip_id" else "a")
                            for c in _SIDE_COLS]))
    fb = wrap(fsub.select(*[F.col(c).alias(f"{c}_b" if c != "clip_id" else "b")
                            for c in _SIDE_COLS]))
    joined = cand.join(fa, "a").join(fb, "b")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.clipfeat import unpack_events, verify_pair
        from ..kernels.sketch import hamming64
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sim_aa = pdf["simhash_audio_a"].to_numpy().astype(np.int64).view(np.uint64)
            sim_ab = pdf["simhash_audio_b"].to_numpy().astype(np.int64).view(np.uint64)
            sim_ta = pdf["simhash_text_a"].to_numpy().astype(np.int64).view(np.uint64)
            sim_tb = pdf["simhash_text_b"].to_numpy().astype(np.int64).view(np.uint64)
            ham_a = hamming64(sim_aa, sim_ab)
            ham_t = hamming64(sim_ta, sim_tb)
            try_audio = pdf["from_audio"].to_numpy() | (ham_a <= cfg.simhash_gate_bits)
            try_text = pdf["from_text"].to_numpy() | (ham_t <= cfg.simhash_gate_bits)
            recs = []
            vp_a = pdf["vpack_a"].to_numpy()
            vp_b = pdf["vpack_b"].to_numpy()
            tx_a = pdf["transcript_a"].to_numpy()
            tx_b = pdf["transcript_b"].to_numpy()
            aa = pdf["a"].to_numpy()
            bb = pdf["b"].to_numpy()
            for i in range(len(pdf)):
                ev_a, ms_a, zc_a = unpack_events(vp_a[i])
                ev_b, _, zc_b = unpack_events(vp_b[i])
                audio_ok, text_ok, span_ms, nchars = verify_pair(
                    ev_a, ms_a, zc_a, ev_b, zc_b,
                    str(tx_a[i]), str(tx_b[i]), cfg,
                    bool(try_audio[i]), bool(try_text[i]))
                if audio_ok or text_ok:
                    recs.append((aa[i], bb[i], audio_ok, text_ok,
                                 float(span_ms), int(nchars)))
            yield pd.DataFrame(recs, columns=["a", "b", "audio_ok", "text_ok",
                                              "span_ms", "span_chars"])

    return joined.mapInPandas(fn, VERIFY_SCHEMA)
