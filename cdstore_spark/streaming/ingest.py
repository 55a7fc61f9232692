"""Incremental streaming ingest + watermarked event-time aggregation.

incremental_dedup_ingest:
    file-source stream of clip rows → Arrow featurize (the same shared
    kernel as batch) → foreachBatch: match the micro-batch's LSH band rows
    against the persisted band index (new-vs-old anti/inner joins — the
    streaming analog of CDStore's fingerprint-batch → server-index lookup,
    SURVEY.md §2.A op 9), append features + discovered candidate pairs.
    Exactly-once by Structured Streaming checkpointing + idempotent
    epoch-tagged writes.

windowed_event_counts:
    watermark + tumbling-window aggregation over the driver's `events`
    table schema — the standard late-data-tolerant streaming agg
    (SURVEY.md §2.B row 30).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, PipelineConfig
from ..engine import candidates as S_cand
from ..engine import featurize as S_feat


def incremental_dedup_ingest(spark: SparkSession, input_dir: str,
                             state_dir: str,
                             cfg: PipelineConfig = DEFAULT,
                             available_now: bool = True):
    """Start the incremental ingest stream; returns the StreamingQuery.

    state_dir/features: accumulated feature rows (parquet, epoch-tagged)
    state_dir/pairs:    accumulated candidate pairs
    state_dir/_checkpoint: Structured Streaming WAL/commit log
    """
    feat_dir = os.path.join(state_dir, "features")
    pair_dir = os.path.join(state_dir, "pairs")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(pair_dir, exist_ok=True)

    stream = (spark.readStream
              .schema(S_feat.CLIP_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_dir))
    feats_stream = S_feat.featurize(stream, cfg)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            spark_l = batch_df.sparkSession
            new_bands = S_cand.explode_bands(batch_df, cfg)
            try:
                old_feats = spark_l.read.parquet(feat_dir)
                have_old = len(old_feats.take(1)) > 0
            except Exception:
                have_old = False
            if have_old:
                old_bands = S_cand.explode_bands(old_feats, cfg)
                key = ["channel", "band_idx", "band_hash"]
                # new-vs-old: inner join on band key (index lookup);
                # new-vs-new: within-batch pairs via the batch engine path
                cross = (new_bands.alias("n")
                         .join(old_bands.alias("o"), on=key, how="inner")
                         .select(F.least("n.clip_id", "o.clip_id").alias("a"),
                                 F.greatest("n.clip_id", "o.clip_id").alias("b"),
                                 "channel")
                         .where(F.col("a") != F.col("b")))
            else:
                cross = None
            within, _ = S_cand.candidate_pairs(batch_df, cfg)
            pairs = within.select("a", "b")
            if cross is not None:
                pairs = pairs.unionByName(
                    cross.select("a", "b")).distinct()
            (pairs.withColumn("epoch", F.lit(epoch_id))
             .write.mode("append").parquet(pair_dir))
            (batch_df.withColumn("epoch", F.lit(epoch_id))
             .write.mode("append").parquet(feat_dir))
        finally:
            batch_df.unpersist()

    writer = (feats_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation",
                      os.path.join(state_dir, "_checkpoint")))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events_stream: DataFrame,
                          watermark: str = "1 hour",
                          window_len: str = "1 day") -> DataFrame:
    """Late-data-tolerant tumbling-window aggregation over event streams."""
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window_len).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))
