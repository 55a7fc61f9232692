"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``cdstore_spark`` (see SURVEY.md §2 for the operator
inventory). Audio-pipeline queries run the distributed engine against the
deterministic synthetic ``audio_clips`` tier matching the sf dir (FIXTURES.md)
through the checkpointed snapshot layer (so repeated queries reuse stage
outputs instead of recomputing the pipeline); their oracles are the frozen
single-node NumPy reference outputs, read by DuckDB straight from the golden
parquet files. Generic training-data operators (dedup/ANN/quality) run over
the driver's ``documents``/``embeddings`` views with recomputing SQL oracles.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))


def _data_root() -> str:
    # single source of truth for the golden cache location (honors
    # CDSTORE_DATA_DIR like golden.py, so cold-start self-healing and the
    # oracle paths can never point at different directories)
    return os.environ.get("CDSTORE_DATA_DIR", os.path.join(_REPO, "data"))


# the driver grades at sf0.01 → correctness tier; oracle SQL strings are
# static, so they reference this tier's golden artifacts by absolute path
_GOLD = os.path.join(_data_root(), "audio_correctness")


def _gold(name: str) -> str:
    return os.path.join(_GOLD, name)


def _tier(sf_dir: str) -> str:
    from cdstore_spark import golden
    return golden.tier_for_sf_dir(sf_dir)


def _audio_outputs(spark: SparkSession, sf_dir: str) -> dict:
    """Run (or reuse via snapshots) the full pipeline for the tier."""
    from cdstore_spark import golden
    from cdstore_spark.engine import pipeline as P
    tier = _tier(sf_dir)
    golden.ensure_golden(tier)
    workdir = os.path.join(golden.DATA_ROOT, f"engine_{tier}")
    return P.run_pipeline(spark, golden.clips_path(tier), workdir)


def _clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdstore_spark import golden
    from cdstore_spark.engine import featurize as S_feat
    tier = _tier(sf_dir)
    golden.ensure_golden(tier)
    return S_feat.load_clips(spark, golden.clips_path(tier))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end near-dup detection + clustering on the smoke
    tier (1000 synthetic clips, 50 planted groups) — returns the cluster
    assignment with per-cluster sizes."""
    out = _audio_outputs(spark, "/root/testdata/sf0.001")
    clusters = out["clusters"]
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (clusters.join(sizes, "cluster_id")
            .select("clip_id", "cluster_id", "cluster_size")
            .orderBy("clip_id"))


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdstore_spark.functions import multimodal as M
    from cdstore_spark.functions import simops as S
    from cdstore_spark.functions import textops as X

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- audio dedup pipeline (engine vs frozen NumPy-oracle goldens) ----
    def audio_ingest_stats(spark, sf):
        return (_clips(spark, sf)
                .groupBy("codec")
                .agg(F.count(F.lit(1)).alias("n_clips"),
                     F.sum(F.col("dur_ms").cast("long")).alias("total_ms"),
                     F.round(F.avg("sr_hz"), 4).alias("avg_sr")))
    q["audio_ingest_stats"] = audio_ingest_stats

    def audio_decode_stats(spark, sf):
        feats = _audio_outputs(spark, sf)["feats"]
        return feats.select("clip_id", "n_samples", "pcm_sha256",
                            F.round("rms", 6).alias("rms_r"))
    q["audio_decode_stats"] = audio_decode_stats

    def audio_candidates(spark, sf):
        return (_audio_outputs(spark, sf)["candidates"]
                .select("a", "b", "from_audio", "from_text"))
    q["audio_candidates"] = audio_candidates

    def audio_confirmed(spark, sf):
        return (_audio_outputs(spark, sf)["confirmed"]
                .select("a", "b", "audio_ok", "text_ok", "span_chars"))
    q["audio_confirmed"] = audio_confirmed

    def audio_clusters(spark, sf):
        return _audio_outputs(spark, sf)["clusters"].select(
            "clip_id", "cluster_id")
    q["audio_clusters"] = audio_clusters

    def audio_cluster_sizes(spark, sf):
        return (_audio_outputs(spark, sf)["clusters"]
                .groupBy("cluster_id")
                .agg(F.count(F.lit(1)).alias("cluster_size"))
                .where(F.col("cluster_size") > 1))
    q["audio_cluster_sizes"] = audio_cluster_sizes

    def audio_dedup_ratio(spark, sf):
        # CDStore's dedup-ratio accounting (SURVEY.md §2.A op 15): logical
        # bytes vs bytes kept if only cluster representatives are stored
        clips = _clips(spark, sf)
        clusters = _audio_outputs(spark, sf)["clusters"]
        j = clips.join(clusters, "clip_id")
        return j.agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum(F.octet_length("bytes").cast("long")).alias("logical_bytes"),
            F.sum(F.when(F.col("clip_id") == F.col("cluster_id"),
                         F.octet_length("bytes").cast("long"))
                  .otherwise(F.lit(0))).alias("stored_bytes"))
    q["audio_dedup_ratio"] = audio_dedup_ratio

    def audio_skew_stats(spark, sf):
        return (_audio_outputs(spark, sf)["skew_stats"]
                .select("channel", "n_buckets", "max_bucket",
                        "subbucket_splits", "buckets_block_split"))
    q["audio_skew_stats"] = audio_skew_stats

    def multimodal_binary_meta(spark, sf):
        return M.binary_meta(_clips(spark, sf))
    q["multimodal_binary_meta"] = multimodal_binary_meta

    def _clip_subset(spark, sf):
        # deterministic 200-clip subset (ids 0..199) — a limit() would pick
        # whichever partitions answered first
        from cdstore_spark import golden_funcs as GF
        return _clips(spark, sf).where(
            F.col("clip_id") < GF.CLIP_SUBSET_MAX)

    def audio_frame_features(spark, sf):
        return M.frame_sample_audio(_clip_subset(spark, sf))
    q["audio_frame_features"] = audio_frame_features

    def image_feature_stub(spark, sf):
        return M.image_feature_summary(_clip_subset(spark, sf))
    q["image_feature_stub"] = image_feature_stub  # stubbed decode kernel

    def audio_resample_stats(spark, sf):
        return M.resample_audio_stats(_clip_subset(spark, sf))
    q["audio_resample_stats"] = audio_resample_stats

    # ---- documents: dedup + text analysis --------------------------------
    def dedup_exact_docs(spark, sf):
        return X.dedup_exact_canonical(_docs(spark, sf))
    q["dedup_exact_docs"] = dedup_exact_docs

    def dedup_jaccard_docs(spark, sf):
        return X.jaccard_pairs(_docs(spark, sf))
    q["dedup_jaccard_docs"] = dedup_jaccard_docs

    def dedup_minhash_lsh_docs(spark, sf):
        return X.minhash_lsh_pairs(_docs(spark, sf))
    q["dedup_minhash_lsh_docs"] = dedup_minhash_lsh_docs

    def dedup_simhash_docs(spark, sf):
        return X.simhash_hamming_pairs(_docs(spark, sf))
    q["dedup_simhash_docs"] = dedup_simhash_docs

    def text_quality_docs(spark, sf):
        return X.quality_features(_docs(spark, sf))
    q["text_quality_docs"] = text_quality_docs

    def doc_fingerprints(spark, sf):
        return X.doc_fingerprints(_docs(spark, sf))
    q["doc_fingerprints"] = doc_fingerprints

    def lang_id_docs(spark, sf):
        return X.lang_id(_docs(spark, sf))
    q["lang_id_docs"] = lang_id_docs

    def doc_dedup_clusters(spark, sf):
        # the full document dedup decision: MinHash-LSH near-dup pairs →
        # distributed union-find → canonical doc per cluster (the same
        # large-star/small-star operator the audio engine uses; singleton
        # docs map to themselves). Golden oracle = DuckDB exact-Jaccard
        # pairs + the shared NumPy union-find kernel.
        from cdstore_spark.engine.cluster import connected_components
        docs = _docs(spark, sf)
        pairs = X.minhash_lsh_pairs(docs).select("a", "b")
        clus = connected_components(
            pairs, docs.select(F.col("doc_id").alias("clip_id")),
            edges_distinct=True)
        return clus.select(F.col("clip_id").alias("doc_id"),
                           F.col("cluster_id").alias("canonical_doc_id"))
    q["doc_dedup_clusters"] = doc_dedup_clusters

    def gram_df_stats_docs(spark, sf):
        return X.gram_df_stats(_docs(spark, sf))
    q["gram_df_stats_docs"] = gram_df_stats_docs

    def token_stats_docs(spark, sf):
        return X.token_stats(_docs(spark, sf))
    q["token_stats_docs"] = token_stats_docs

    def dedup_embedding_cosine(spark, sf):
        return S.cosine_pairs_exact(_embs(spark, sf), threshold=0.4)
    q["dedup_embedding_cosine"] = dedup_embedding_cosine

    # ---- embeddings: similarity search ------------------------------------
    def _query_vec(spark, sf):
        row = (_embs(spark, sf).where(F.col("vec_id") == 0)
               .select("embedding").collect())
        return [float(v) for v in row[0][0]]

    def ann_topk_cosine(spark, sf):
        return S.topk_bruteforce(_embs(spark, sf), _query_vec(spark, sf),
                                 k=10, exclude_vec_id=0)
    q["ann_topk_cosine"] = ann_topk_cosine

    def ann_lsh_bucketed(spark, sf):
        return S.topk_lsh(_embs(spark, sf), _query_vec(spark, sf),
                          k=10, exclude_vec_id=0)
    q["ann_lsh_bucketed"] = ann_lsh_bucketed

    def ann_lsh_multiprobe(spark, sf):
        # multi-probe LSH (Hamming<=1 neighbor buckets): the recall/scan-
        # fraction dial exercised at r=1 — probes 9 of 256 sign buckets
        # instead of 1, recovering neighbors that flip one hyperplane
        return S.topk_lsh(_embs(spark, sf), _query_vec(spark, sf),
                          k=10, exclude_vec_id=0, multiprobe=1)
    q["ann_lsh_multiprobe"] = ann_lsh_multiprobe

    def ann_ivf_topk(spark, sf):
        # persisted inverted-file index: build once (cached on disk),
        # probe only the nprobe nearest list partitions
        from cdstore_spark import golden
        idx = os.path.join(golden.DATA_ROOT,
                           f"ann_ivf_{os.path.basename(os.path.normpath(sf))}")
        S.ensure_ivf_index(spark, _embs(spark, sf), idx)
        return S.topk_ivf(spark, idx, _query_vec(spark, sf),
                          k=10, nprobe=4, exclude_vec_id=0)
    q["ann_ivf_topk"] = ann_ivf_topk

    def embedding_centroids(spark, sf):
        return S.pairwise_label_centroids(_embs(spark, sf))
    q["embedding_centroids"] = embedding_centroids

    # ---- relational sweep over the TPC-H-ish views (SURVEY.md §2.B) ------
    def _t(spark, sf, name):
        return spark.read.parquet(os.path.join(sf, f"{name}.parquet"))

    def tpch_q1_pricing(spark, sf):
        li = _t(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.round(F.sum(dec("l_quantity")).cast("double"), 2)
                     .alias("sum_qty"),
                     F.round(F.sum(dec("l_extendedprice")).cast("double"), 2)
                     .alias("sum_base_price"),
                     F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                     F.count(F.lit(1)).alias("count_order")))
    q["tpch_q1_pricing"] = tpch_q1_pricing

    def tpch_q3_shipping(spark, sf):
        c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        rev = (F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1).cast("decimal(18,2)")
                  - F.col("l_discount").cast("decimal(18,2)")))
        return (li.join(o, li.l_orderkey == o.o_orderkey)
                .join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .groupBy("l_orderkey")
                .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
                .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
                .limit(10))
    q["tpch_q3_shipping"] = tpch_q3_shipping

    def tpch_q5_region_revenue(spark, sf):
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        rev = (F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1).cast("decimal(18,2)")
                  - F.col("l_discount").cast("decimal(18,2)")))
        return (li.join(o, li.l_orderkey == o.o_orderkey)
                .join(c, o.o_custkey == c.c_custkey)
                .join(s, (li.l_suppkey == s.s_suppkey)
                      & (c.c_nationkey == s.s_nationkey))
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                .groupBy("n_name")
                .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
                     F.count(F.lit(1)).alias("n_items")))
    q["tpch_q5_region_revenue"] = tpch_q5_region_revenue

    def top_parts_by_price(spark, sf):
        return (_t(spark, sf, "part")
                .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
                .select("p_partkey", "p_name", "p_retailprice")
                .limit(10))
    q["top_parts_by_price"] = top_parts_by_price

    def customer_top_orders_window(spark, sf):
        from pyspark.sql import Window
        o = _t(spark, sf, "orders")
        w = (Window.partitionBy("o_custkey")
             .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
        return (o.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= 3)
                .select("o_custkey", "o_orderkey", "o_totalprice", "rk"))
    q["customer_top_orders_window"] = customer_top_orders_window

    def orders_by_month(spark, sf):
        o = _t(spark, sf, "orders")
        return (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.round(F.avg("o_totalprice"), 4).alias("avg_price")))
    q["orders_by_month"] = orders_by_month

    def events_user_daily(spark, sf):
        e = _t(spark, sf, "events")
        return (e.groupBy("user_id",
                          F.date_trunc("day", "ts").alias("day"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.countDistinct("event_type").alias("n_types"),
                     F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                             .cast("double"), 2).alias("total_value")))
    q["events_user_daily"] = events_user_daily

    def events_first_touch(spark, sf):
        from pyspark.sql import Window
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (e.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .select("user_id", "event_id", "event_type"))
    q["events_first_touch"] = events_first_touch

    def customers_without_f_orders(spark, sf):
        c = _t(spark, sf, "customer").select("c_custkey")
        f_orders = (_t(spark, sf, "orders")
                    .where(F.col("o_orderstatus") == "F")
                    .select(F.col("o_custkey").alias("c_custkey")))
        return c.join(f_orders, "c_custkey", "left_anti").distinct()
    q["customers_without_f_orders"] = customers_without_f_orders

    def part_brand_stats(spark, sf):
        p = _t(spark, sf, "part")
        return (p.where(F.col("p_type").like("%AND%"))
                .groupBy("p_brand")
                .agg(F.count(F.lit(1)).alias("n_parts"),
                     F.max("p_size").alias("max_size"),
                     F.round(F.avg("p_retailprice"), 4).alias("avg_price")))
    q["part_brand_stats"] = part_brand_stats

    def tpch_q6_forecast_revenue(spark, sf):
        li = _t(spark, sf, "lineitem")
        rev = (F.col("l_extendedprice").cast("decimal(18,2)")
               * F.col("l_discount").cast("decimal(18,4)"))
        return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                         & (F.col("l_shipdate") < F.lit("1997-01-01"))
                         & (F.col("l_discount").between(0.03, 0.07))
                         & (F.col("l_quantity") < 24))
                .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
                     F.count(F.lit(1)).alias("n_rows")))
    q["tpch_q6_forecast_revenue"] = tpch_q6_forecast_revenue

    def orders_rollup(spark, sf):
        o = _t(spark, sf, "orders")
        return (o.rollup("o_orderstatus", "o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.round(F.avg("o_totalprice"), 4).alias("avg_price")))
    q["orders_rollup"] = orders_rollup

    def events_range_join(spark, sf):
        # range join done scale-honestly: bucket timestamps to the range
        # width and equi-join on (user, bucket) with the left side
        # exploded over {bkt, bkt+1}, so Catalyst plans a hash join
        # instead of the BroadcastNestedLoopJoin a raw |t1-t2|<=300 theta
        # join degrades to. Output: per-user count of ordered event pairs
        # within 300s.
        e = (_t(spark, sf, "events")
             .select("user_id", "event_id",
                     F.unix_timestamp("ts").alias("t")))
        lb = e.withColumn("bkt", F.floor(F.col("t") / 300))
        left = (lb.withColumn(
            "jb", F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)))
            .select("user_id", F.col("event_id").alias("id1"),
                    F.col("t").alias("t1"), "jb"))
        right = lb.select("user_id", F.col("event_id").alias("id2"),
                          F.col("t").alias("t2"),
                          F.col("bkt").alias("jb"))
        pairs = (left.join(right, ["user_id", "jb"])
                 .where((F.col("t2") - F.col("t1")).between(0, 300)
                        & ((F.col("t2") > F.col("t1"))
                           | (F.col("id2") > F.col("id1"))))
                 .select("user_id", "id1", "id2").distinct())
        return (pairs.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_close_pairs")))
    q["events_range_join"] = events_range_join

    def orders_asof_event(spark, sf):
        # as-of join done scale-honestly: tag and union both sides, one
        # window pass per key carries the latest event forward (no
        # per-row range probe, no nested loop). Latest event with
        # ts <= o_orderdate per customer; ties on ts break to the larger
        # event_id; -1 when no prior event exists.
        from pyspark.sql import Window

        def naive_epoch(c):
            # seconds of the NAIVE timestamp as written in parquet,
            # independent of spark.sql.session.timeZone: cast to
            # TIMESTAMP_NTZ (no-op when the reader already inferred NTZ;
            # inverts the reader's session-tz conversion otherwise), then
            # diff against an NTZ epoch literal — matches the DuckDB
            # oracle's epoch() under ANY session timezone, where a bare
            # unix_timestamp(TIMESTAMP) would shift order dates relative
            # to event timestamps and flip as-of results near midnight.
            return F.timestamp_diff(
                "SECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                F.col(c).cast("timestamp_ntz"))

        o = (_t(spark, sf, "orders")
             .select(F.col("o_custkey").alias("k"), "o_orderkey",
                     naive_epoch("o_orderdate").alias("t"),
                     F.lit(1).alias("is_order"),
                     F.lit(None).cast("long").alias("ev")))
        e = (_t(spark, sf, "events")
             .select(F.col("user_id").alias("k"),
                     F.lit(None).cast("long").alias("o_orderkey"),
                     naive_epoch("ts").alias("t"),
                     F.lit(0).alias("is_order"),
                     F.col("event_id").cast("long").alias("ev")))
        w = (Window.partitionBy("k")
             .orderBy("t", "is_order", "ev")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        merged = (o.unionByName(e)
                  .withColumn("asof", F.last("ev", ignorenulls=True).over(w)))
        return (merged.where(F.col("is_order") == 1)
                .select("o_orderkey",
                        F.coalesce("asof", F.lit(-1)).alias("asof_event_id")))
    q["orders_asof_event"] = orders_asof_event

    def events_sessionization(spark, sf):
        # gap-based sessionization (30-min inactivity): lag window + running
        # sum of session-break flags — the batch formulation of streaming
        # session windows (SURVEY.md §2.B rows 21/30)
        from pyspark.sql import Window
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(
            F.lag("ts").over(w))
        brk = F.when(gap > 1800, 1).otherwise(0)
        sess = (e.withColumn("brk", F.coalesce(brk, F.lit(0)))
                .withColumn("session_id", F.sum("brk").over(w)))
        return (sess.groupBy("user_id", "session_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.min("ts").alias("session_start"),
                     F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                             .cast("double"), 2).alias("session_value")))
    q["events_sessionization"] = events_sessionization

    def lineitem_flag_pivot(spark, sf):
        li = _t(spark, sf, "lineitem")
        month = F.date_trunc("month", "l_shipdate").alias("month")
        def cnt(flag):
            return F.sum(F.when(F.col("l_returnflag") == flag, 1)
                         .otherwise(0)).alias(f"n_{flag}")
        return li.groupBy(month).agg(cnt("R"), cnt("A"), cnt("N"))
    q["lineitem_flag_pivot"] = lineitem_flag_pivot

    def customers_with_big_order(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        big = o.where(F.col("o_totalprice") > 400000).select(
            F.col("o_custkey").alias("c_custkey"))
        return (c.join(big, "c_custkey", "leftsemi")
                .select("c_custkey", "c_name", "c_mktsegment"))
    q["customers_with_big_order"] = customers_with_big_order

    def orders_json_roundtrip(spark, sf):
        # SURVEY.md §2.B row 29: to_json/from_json/get_json_object — the
        # lineage-sidecar serialization pattern, gated by a plain-columns
        # oracle (serialize a struct, parse it back, extract fields)
        o = _t(spark, sf, "orders")
        j = F.to_json(F.struct("o_orderstatus", "o_totalprice",
                               "o_orderpriority"))
        parsed = F.from_json(
            j, "o_orderstatus string, o_totalprice double,"
               " o_orderpriority string")
        return o.select(
            "o_orderkey",
            parsed["o_orderstatus"].alias("status_rt"),
            F.round(parsed["o_totalprice"], 2).alias("price_rt"),
            F.get_json_object(j, "$.o_orderpriority").alias("prio_rt"))
    q["orders_json_roundtrip"] = orders_json_roundtrip

    def priorities_in_both_statuses(spark, sf):
        # literal INTERSECT (set semantics) — SURVEY.md §2.B row 23
        o = _t(spark, sf, "orders")
        f_prio = (o.where(F.col("o_orderstatus") == "F")
                  .select("o_orderpriority"))
        o_prio = (o.where(F.col("o_orderstatus") == "O")
                  .select("o_orderpriority"))
        return f_prio.intersect(o_prio)
    q["priorities_in_both_statuses"] = priorities_in_both_statuses

    def streaming_incremental_features(spark, sf):
        # Structured Streaming contract surface (SURVEY.md §2.B row 30):
        # availableNow file-source ingest accumulates epoch-partitioned
        # feature state; per-clip featurize is deterministic, so the
        # accumulated rows must equal the batch engine's frozen golden
        from cdstore_spark.streaming import ingest as SI
        state = SI.ensure_incremental_run(spark, _tier(sf))
        feats = spark.read.parquet(os.path.join(state, "features"))
        return feats.select("clip_id", "n_samples", "pcm_sha256")
    q["streaming_incremental_features"] = streaming_incremental_features

    def customer_nation_except_all(spark, sf):
        # literal EXCEPT ALL (multiset semantics) — SURVEY.md §2.B row 23
        c = (_t(spark, sf, "customer")
             .select(F.col("c_nationkey").alias("nationkey")))
        s = (_t(spark, sf, "supplier")
             .select(F.col("s_nationkey").alias("nationkey")))
        return c.exceptAll(s)
    q["customer_nation_except_all"] = customer_nation_except_all

    return q


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; views pre-registered by the driver)
# --------------------------------------------------------------------------

def _stopword_list_sql() -> str:
    from cdstore_spark.functions.textops import STOPWORDS
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


_TEXT_QUALITY_SQL_TMPL = r"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(lower(text), '\s+') AS t
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       length(text) AS n_chars_measured,
       floor(length(regexp_replace(text, '\s+', '', 'g'))
             / greatest(len(t), 1) * 1e6 + 0.5) / 1e6 AS avg_word_len,
       len(list_intersect(t, {SW})) AS n_stopword_types,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
       floor((least(len(t) / 64.0, 1.0) * 0.5
             + (len(list_intersect(t, {SW}))
                / greatest(len(t), 1)) * 0.3
             + CASE WHEN length(regexp_replace(text, '\s+', '', 'g'))
                         / greatest(len(t), 1) BETWEEN 3.0 AND 9.0
                    THEN 0.2 ELSE 0.0 END) * 1e6 + 0.5) / 1e6
           AS quality_score
FROM base"""


def _text_quality_sql() -> str:
    return _TEXT_QUALITY_SQL_TMPL.replace("{SW}", _stopword_list_sql())


def oracle_sql() -> dict[str, str]:
    _TEXT_QUALITY_SQL = _text_quality_sql()
    # the audio/function oracles read frozen golden parquet by absolute
    # path; if the (gitignored) cache was wiped, regenerate it
    # deterministically now so the DuckDB side never sees a missing file
    # regardless of whether the driver evaluates oracles before or after
    # the Spark queries. Failures are printed, not swallowed — a golden
    # regeneration error must be attributable at its root cause.
    import traceback
    try:
        from cdstore_spark import golden as _g
        from cdstore_spark import golden_funcs as _gf
        _g.ensure_golden("correctness")
        _gf.ensure_func_golden()
    except Exception:
        print("GOLDEN REGENERATION FAILED — audio/function oracles "
              "will reference missing parquet:")
        traceback.print_exc()
    from cdstore_spark import golden_funcs as GF
    clips = _gold("audio_clips.parquet")
    pcm = _gold("expected_pcm_stats.parquet")
    candp = _gold("expected_candidates.parquet")
    pairs = _gold("expected_pairs.parquet")
    clus = _gold("expected_clusters.parquet")

    grams_cte = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id
), inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       floor(i / (sa.sz + sb.sz - i) * 1e6 + 0.5) / 1e6 AS jaccard
FROM inter JOIN sizes sa ON inter.a = sa.doc_id
           JOIN sizes sb ON inter.b = sb.doc_id
WHERE i / (sa.sz + sb.sz - i) >= 0.8
"""

    return {
        # ---- audio pipeline vs frozen NumPy-oracle goldens ----
        "audio_ingest_stats": f"""
            SELECT codec, count(*) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS total_ms,
                   round(avg(sr_hz), 4) AS avg_sr
            FROM read_parquet('{clips}') GROUP BY codec""",
        "audio_decode_stats": f"""
            SELECT clip_id, n_samples, pcm_sha256,
                   round(rms, 6) AS rms_r
            FROM read_parquet('{pcm}')""",
        "audio_candidates": f"""
            SELECT a, b, from_audio, from_text
            FROM read_parquet('{candp}')""",
        "audio_confirmed": f"""
            SELECT a, b, audio_ok, text_ok,
                   CAST(span_chars AS INTEGER) AS span_chars
            FROM read_parquet('{pairs}')""",
        "audio_clusters": f"""
            SELECT clip_id, cluster_id FROM read_parquet('{clus}')""",
        "audio_cluster_sizes": f"""
            SELECT cluster_id, count(*) AS cluster_size
            FROM read_parquet('{clus}')
            GROUP BY cluster_id HAVING count(*) > 1""",
        "audio_dedup_ratio": f"""
            SELECT count(*) AS n_clips,
                   count(DISTINCT g.cluster_id) AS n_clusters,
                   CAST(sum(octet_length(c.bytes)) AS BIGINT)
                       AS logical_bytes,
                   CAST(sum(CASE WHEN c.clip_id = g.cluster_id
                            THEN octet_length(c.bytes) ELSE 0 END) AS BIGINT)
                       AS stored_bytes
            FROM read_parquet('{clips}') c
            JOIN read_parquet('{clus}') g USING (clip_id)""",
        "streaming_incremental_features": f"""
            SELECT clip_id, n_samples, pcm_sha256
            FROM read_parquet(
                '{GF.path("expected_stream_features.parquet")}')""",
        "audio_skew_stats": f"""
            SELECT channel, n_buckets, max_bucket, subbucket_splits,
                   buckets_block_split
            FROM read_parquet('{GF.path("expected_skew_stats.parquet")}')""",
        "audio_frame_features": f"""
            SELECT clip_id, CAST(frame_idx AS INTEGER) AS frame_idx,
                   frame_rms, frame_peak
            FROM read_parquet(
                '{GF.path("expected_frame_features.parquet")}')""",
        "audio_resample_stats": f"""
            SELECT clip_id, CAST(sr_from AS INTEGER) AS sr_from,
                   CAST(sr_to AS INTEGER) AS sr_to, n_samples_out, rms_out
            FROM read_parquet(
                '{GF.path("expected_resample_stats.parquet")}')""",
        "image_feature_stub": f"""
            SELECT clip_id, CAST(width AS INTEGER) AS width,
                   CAST(height AS INTEGER) AS height, feature_md5,
                   feature_mean
            FROM read_parquet('{GF.path("expected_image_stub.parquet")}')""",
        "dedup_simhash_docs": f"""
            SELECT a, b, CAST(hamming AS INTEGER) AS hamming
            FROM read_parquet(
                '{GF.path("expected_simhash_pairs.parquet")}')""",
        "doc_fingerprints": f"""
            SELECT doc_id, fp
            FROM read_parquet('{GF.path("expected_fingerprints.parquet")}')""",
        "lang_id_docs": f"""
            SELECT doc_id, lang_pred, lang_score
            FROM read_parquet('{GF.path("expected_lang_id.parquet")}')""",
        "doc_dedup_clusters": f"""
            SELECT doc_id, canonical_doc_id
            FROM read_parquet('{GF.path("expected_doc_clusters.parquet")}')""",
        "ann_lsh_bucketed": f"""
            SELECT vec_id, cos_sim
            FROM read_parquet('{GF.path("expected_ann_lsh.parquet")}')""",
        "ann_lsh_multiprobe": f"""
            SELECT vec_id, cos_sim
            FROM read_parquet('{GF.path("expected_ann_lsh_mp1.parquet")}')""",
        "ann_ivf_topk": f"""
            SELECT vec_id, cos_sim
            FROM read_parquet('{GF.path("expected_ann_ivf.parquet")}')""",
        "multimodal_binary_meta": f"""
            SELECT clip_id,
                   CAST(octet_length(bytes) AS BIGINT) AS n_bytes,
                   md5(lower(hex(bytes))) AS content_md5,
                   CAST(('0x' || substring(hex(bytes), 1, 8))::UBIGINT
                        AS BIGINT) AS header_u32
            FROM read_parquet('{clips}')""",

        # ---- documents ----
        "dedup_exact_docs": """
            SELECT doc_id, md5(text) AS text_md5,
                   min(doc_id) OVER (PARTITION BY md5(text))
                       AS canonical_doc_id
            FROM documents""",
        "dedup_jaccard_docs": grams_cte,
        "dedup_minhash_lsh_docs": grams_cte,
        "gram_df_stats_docs": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
              FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
              WHERE len(t) >= 3
            ), dfreq AS (
              SELECT gram, count(*) AS gdf FROM grams GROUP BY 1
            )
            SELECT count(*) AS n_grams, max(gdf) AS max_df,
                   CAST(sum(CASE WHEN gdf > 32 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hot_grams,
                   CAST(sum(gdf) AS BIGINT) AS n_gram_postings
            FROM dfreq""",
        "text_quality_docs": _TEXT_QUALITY_SQL,

        "token_stats_docs": r"""
            WITH sub AS (
              SELECT doc_id,
                     string_split_regex(lower(text), '\s+') AS ws,
                     regexp_extract_all(lower(text),
                         '[a-z]+|[0-9]+|[^a-z0-9\s]+') AS sub,
                     regexp_extract_all(lower(text), '[a-z]+') AS alpha,
                     regexp_extract_all(lower(text), '[0-9]+') AS num
              FROM documents)
            SELECT doc_id,
                   len(ws) AS n_ws_tokens,
                   len(sub) AS n_subtokens,
                   len(alpha) AS n_alpha_tokens,
                   len(num) AS n_num_tokens,
                   floor(CAST(len(array_to_string(sub, '')) AS DOUBLE)
                         / greatest(len(sub), 1) * 1e6 + 0.5) / 1e6
                       AS avg_subtoken_len
            FROM sub""",

        # ---- embeddings ----
        "dedup_embedding_cosine": """
            SELECT l.vec_id AS a, r.vec_id AS b,
                   floor(list_cosine_similarity(
                       l.embedding::DOUBLE[], r.embedding::DOUBLE[])
                       * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
            WHERE list_cosine_similarity(
                l.embedding::DOUBLE[], r.embedding::DOUBLE[]) >= 0.4""",
        "ann_topk_cosine": """
            SELECT vec_id,
                   floor(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings
                        WHERE vec_id = 0)) * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM embeddings WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id LIMIT 10""",
        "embedding_centroids": """
            WITH exploded AS (
              SELECT label,
                     CAST(unnest(range(0, len(embedding))) AS INTEGER)
                         AS dim,
                     unnest(embedding::DOUBLE[]) AS val
              FROM embeddings)
            SELECT label, dim,
                   floor(avg(val) * 1e6 + 0.5) / 1e6 AS mean_val,
                   count(*) AS n
            FROM exploded GROUP BY label, dim ORDER BY label, dim""",

        # ---- relational sweep ----
        "tpch_q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3_shipping": """
            SELECT l_orderkey,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2))))
                         AS DOUBLE), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "tpch_q5_region_revenue": """
            SELECT n_name,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2))))
                         AS DOUBLE), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                          AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name""",
        "top_parts_by_price": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10""",
        "customer_top_orders_window": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey) AS rk
              FROM orders) WHERE rk <= 3""",
        "orders_by_month": """
            SELECT date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders,
                   round(avg(o_totalprice), 4) AS avg_price
            FROM orders GROUP BY 1""",
        "events_user_daily": """
            SELECT user_id, date_trunc('day', ts) AS day,
                   count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS total_value
            FROM events GROUP BY 1, 2""",
        "events_first_touch": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rk
              FROM events) WHERE rk = 1""",
        "customers_without_f_orders": """
            SELECT DISTINCT c_custkey FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
        "part_brand_stats": """
            SELECT p_brand, count(*) AS n_parts, max(p_size) AS max_size,
                   round(avg(p_retailprice), 4) AS avg_price
            FROM part WHERE p_type LIKE '%AND%'
            GROUP BY p_brand""",
        "tpch_q6_forecast_revenue": """
            SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 4)
                       AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24""",
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(avg(o_totalprice), 4) AS avg_price
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "customers_with_big_order": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)""",
        "orders_asof_event": """
            SELECT o.o_orderkey,
                   COALESCE((
                     SELECT max(e.event_id) FROM events e
                     WHERE e.user_id = o.o_custkey
                       AND epoch(e.ts) <= epoch(o.o_orderdate)
                       AND epoch(e.ts) = (
                         SELECT max(epoch(e2.ts)) FROM events e2
                         WHERE e2.user_id = o.o_custkey
                           AND epoch(e2.ts) <= epoch(o.o_orderdate))
                   ), -1) AS asof_event_id
            FROM orders o""",
        "events_range_join": """
            WITH e AS (
              SELECT user_id, event_id, epoch(ts) AS t FROM events
            )
            SELECT l.user_id, count(*) AS n_close_pairs
            FROM e l JOIN e r
              ON l.user_id = r.user_id
             AND r.t - l.t BETWEEN 0 AND 300
             AND (r.t > l.t OR r.event_id > l.event_id)
            GROUP BY l.user_id""",
        "events_sessionization": """
            WITH flagged AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                              (PARTITION BY user_id
                               ORDER BY ts, event_id)) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            sess AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
              FROM flagged)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS session_value
            FROM sess GROUP BY user_id, session_id""",
        "orders_json_roundtrip": """
            SELECT o_orderkey, o_orderstatus AS status_rt,
                   round(o_totalprice, 2) AS price_rt,
                   o_orderpriority AS prio_rt
            FROM orders""",
        "priorities_in_both_statuses": """
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'""",
        "customer_nation_except_all": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS nationkey FROM supplier""",
        "lineitem_flag_pivot": """
            SELECT date_trunc('month', l_shipdate) AS month,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_R,
                   CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_A,
                   CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_N
            FROM lineitem GROUP BY 1""",
    }
