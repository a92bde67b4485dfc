"""Approximate nearest neighbors over an embedding column.

Two paths, per the training-pipeline brief:
- brute-force cosine top-k (the baseline; exact, one broadcast of the query)
- random-hyperplane LSH buckets (the 10^12-scale path): sign-bit signature
  over H seeded hyperplanes → groupBy bucket; queries probe their own
  bucket plus all Hamming-1 neighbors (multiprobe), then score exactly
  within candidates. Candidate generation is a plain groupBy — the same
  shuffle shape as the MinHash band stage, so it scales the same way.

Everything except the hyperplane projection (a NumPy matmul in an
Arrow-batched pandas UDF) is JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hyperplanes(seed: int, n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def make_bucket_udf(seed: int, n_planes: int, dim: int):
    planes = hyperplanes(seed, n_planes, dim)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        bits = (mat @ planes.T) >= 0.0  # (n, planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return bucket_udf


def cosine_col(a, b):
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x)
    nb = F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x)
    return dot / F.sqrt(na * nb)


def brute_force_topk(embeddings: DataFrame, query_id: int, k: int = 10) -> DataFrame:
    """Exact cosine top-k for one query vector (the correctness baseline)."""
    q = embeddings.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        embeddings.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine_col(F.col("embedding"), F.col("q_emb")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Hyperplane-LSH top-k: score only vectors whose bucket is within
    Hamming distance 1 of the query's bucket (multiprobe)."""
    bucket_udf = make_bucket_udf(seed, n_planes, dim)
    bucketed = embeddings.withColumn("bucket", bucket_udf("embedding"))
    q = bucketed.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    probe = F.array(
        F.col("q_bucket"),
        *[
            F.col("q_bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
            for i in range(n_planes)
        ],
    )
    return (
        bucketed.where(F.col("vec_id") != query_id)
        .join(F.broadcast(q.withColumn("probes", probe)), F.expr("array_contains(probes, bucket)"))
        .select("vec_id", cosine_col(F.col("embedding"), F.col("q_emb")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )
