"""S1 ingest + S2–S5 featurize: clips table → per-clip sketch row.

Ingest is a plain columnar scan (Catalyst prunes `bytes` out of every stage
that doesn't decode — asserted in tests via explain()). Featurize runs the
shared NumPy kernel batch-at-a-time through mapInPandas (Arrow transfer,
zero per-row Python); its output drops `bytes`, so everything downstream of
S2 moves only sketches + event streams (~KB/clip instead of ~50 KB/clip) —
the same traffic-shaping idea as CDStore's client-side intra-user dedup
before upload (SURVEY.md §2.A op 8).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import DEFAULT, PipelineConfig

CLIP_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("transcript", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("n_events", T.IntegerType()),
    T.StructField("events", T.ArrayType(T.IntegerType())),
    T.StructField("event_ms", T.ArrayType(T.FloatType())),
    T.StructField("event_zcr", T.ArrayType(T.FloatType())),
    T.StructField("n_shingles_audio", T.IntegerType()),
    T.StructField("n_shingles_text", T.IntegerType()),
    T.StructField("sig_audio", T.ArrayType(T.LongType())),
    T.StructField("sig_text", T.ArrayType(T.LongType())),
    T.StructField("simhash_audio", T.LongType()),
    T.StructField("simhash_text", T.LongType()),
    T.StructField("bands_audio", T.ArrayType(T.LongType())),
    T.StructField("bands_text", T.ArrayType(T.LongType())),
    T.StructField("n_samples", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("pcm_sha256", T.StringType()),
    T.StructField("transcript", T.StringType()),
])


def load_clips(spark: SparkSession, path: str) -> DataFrame:
    """S1: columnar scan of the clips table (Iceberg on a real cluster;
    parquet fallback here — storage.py abstracts the two)."""
    return spark.read.schema(CLIP_SCHEMA).parquet(path)


def featurize(clips: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """S2–S5 in one Arrow pass: decode → events → CDC shingles → MinHash /
    SimHash / LSH band hashes, per clip. Transcript is passed through for
    the verify stage; `bytes` is dropped here and never shuffled."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavy imports inside the worker, once per task
        from ..kernels.clipfeat import featurize_batch
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = featurize_batch(pdf, cfg, with_pcm_stats=True)
            out["transcript"] = pdf["transcript"].astype(str).to_numpy()
            yield out

    return clips.mapInPandas(fn, FEATURE_SCHEMA)
