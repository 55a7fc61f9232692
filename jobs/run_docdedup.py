"""Document near-dup pipeline entry point — the text-corpus twin of
jobs/run_dedup.py, launched the same way:

    zip -r cdstore_spark.zip cdstore_spark
    spark-submit --py-files cdstore_spark.zip jobs/run_docdedup.py \
        --input <documents parquet dir> --output <result dir> \
        [--threshold 0.8] [--mode lsh|exact]

Runs MinHash-LSH (or prefix-filtered exact) Jaccard pair detection over a
documents table (doc_id, text, ...), unions the pairs into clusters with
the distributed large-star/small-star operator, and writes:

    <output>/pairs/     (a, b, jaccard)
    <output>/clusters/  (doc_id, canonical_doc_id)
    one-line JSON summary on stdout (docs, pairs, clusters, keep ratio)
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="result directory")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--mode", choices=["lsh", "exact"], default="lsh",
                    help="lsh = MinHash-LSH candidates (the scale path); "
                         "exact = prefix-filtered exact Jaccard")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cdstore_spark.engine.cluster import connected_components
    from cdstore_spark.functions import textops as X

    spark = SparkSession.builder.appName("cdstore-docdedup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    if args.mode == "lsh":
        pairs = X.minhash_lsh_pairs(docs, threshold=args.threshold)
    else:
        pairs = X.jaccard_pairs(docs, threshold=args.threshold)
    pairs = pairs.persist()
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    clusters = connected_components(
        pairs.select("a", "b"),
        docs.select(F.col("doc_id").alias("clip_id"))).select(
        F.col("clip_id").alias("doc_id"),
        F.col("cluster_id").alias("canonical_doc_id"))
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    out = spark.read.parquet(f"{args.output}/clusters")
    n_docs = out.count()
    n_keep = out.select("canonical_doc_id").distinct().count()
    print(json.dumps({
        "docs": n_docs,
        "pairs": pairs.count(),
        "clusters": n_keep,
        "keep_ratio": round(n_keep / max(n_docs, 1), 4),
        "mode": args.mode,
        "threshold": args.threshold,
        "wall_s": round(time.time() - t0, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
