"""Incremental streaming ingest + watermarked event-time aggregation.

incremental_dedup_ingest:
    file-source stream of clip rows → Arrow featurize (the same shared
    kernel as batch) → foreachBatch: match the micro-batch's LSH band rows
    against the persisted band index (new-vs-old anti/inner joins — the
    streaming analog of CDStore's fingerprint-batch → server-index lookup,
    SURVEY.md §2.A op 9), append features + discovered candidate pairs.
    Exactly-once by Structured Streaming checkpointing + IDEMPOTENT
    epoch-partitioned writes: every output is partitioned by epoch and
    written with dynamic partition overwrite, so a micro-batch retried
    after a partial write replaces its own epoch partition instead of
    appending duplicates.

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
                # match ONLY strictly-earlier epochs: a REPLAYED epoch
                # must see exactly the index state its original run saw,
                # or its epoch partition's pair content would differ (and
                # pairs already owned by later epochs would duplicate)
                old_feats = (spark_l.read.parquet(feat_dir)
                             .where(F.col("epoch") < F.lit(int(epoch_id))))
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
            # idempotent: overwrite THIS epoch's partition only — a retry
            # (crash between the two writes, or before the streaming
            # commit) replaces its own rows instead of duplicating them
            (pairs.withColumn("epoch", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch").parquet(pair_dir))
            (batch_df.withColumn("epoch", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch").parquet(feat_dir))
        finally:
            batch_df.unpersist()

    writer = (feats_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation",
                      os.path.join(state_dir, "_checkpoint")))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ensure_incremental_run(spark: SparkSession, tier: str = "correctness",
                           n_files: int = 16,
                           cfg: PipelineConfig = DEFAULT) -> str:
    """Deterministic cached availableNow ingest over a golden tier's clips:
    the tier table is split into n_files parquet files, streamed through
    incremental_dedup_ingest (maxFilesPerTrigger batches them into several
    micro-batch epochs), and the accumulated state is frozen under
    data/stream_<tier>/ for the streaming contract query. Because
    featurize is deterministic per clip, the accumulated feature rows must
    equal the batch engine's — which is what the oracle checks."""
    import json
    import shutil

    import pyarrow.parquet as pq

    from .. import golden

    from ..engine.pipeline import ENGINE_LAYOUT_VERSION

    state = os.path.join(golden.DATA_ROOT, f"stream_{tier}")
    marker = os.path.join(state, "_STREAM_DONE.json")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f).get("layout") == ENGINE_LAYOUT_VERSION:
                    return state
        except (json.JSONDecodeError, OSError):
            pass
        # stale layout (featurize schema changed) — rebuild from scratch
    shutil.rmtree(state, ignore_errors=True)
    input_dir = os.path.join(state, "input")
    os.makedirs(input_dir, exist_ok=True)
    golden.ensure_clips(tier)
    tbl = pq.read_table(golden.clips_path(tier))
    step = (tbl.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part,
                           os.path.join(input_dir, f"part-{i:04d}.parquet"),
                           row_group_size=512)
    query = incremental_dedup_ingest(spark, input_dir, state, cfg)
    query.awaitTermination()
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"tier": tier, "n_files": n_files,
                   "layout": ENGINE_LAYOUT_VERSION}, f)
    os.replace(tmp, marker)
    return state


def running_codec_stats(clip_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-
    codec RUNNING clip count + payload byte total across micro-batches —
    the arbitrary-state API the brief names for operators that tumbling
    windows can't express (monotone running aggregates over an unbounded
    key lifetime). State is one (count, bytes) pair per codec; each
    micro-batch emits the updated running totals for the codecs it saw.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "codec string, n_clips long, total_bytes long"
    state_schema = "n long, b long"

    def fn(key, pdfs, state: GroupState):
        n, b = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["n_bytes"].sum())
        state.update((n, b))
        yield pd.DataFrame({"codec": [key[0]], "n_clips": [n],
                            "total_bytes": [b]})

    keyed = clip_stream.select(
        "codec", F.octet_length("bytes").cast("long").alias("n_bytes"))
    return keyed.groupBy("codec").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


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
