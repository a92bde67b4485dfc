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


def make_multitable_bucket_udf(seed: int, n_planes: int, n_tables: int, dim: int):
    """embedding → array<int> of one bucket id per table (table id in the
    high bits so ids never collide across tables)."""
    planes = hyperplanes(seed, n_planes * n_tables, dim).reshape(n_tables, n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    offsets = (np.arange(n_tables) << 24).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType(), False))
    def buckets_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        bits = np.einsum("nd,tpd->ntp", mat, planes) >= 0.0  # (n, tables, planes)
        ids = bits @ weights + offsets[None, :]  # (n, tables)
        return pd.Series(list(ids.astype(np.int32)))

    return buckets_udf


def _query_probes(
    q_emb: np.ndarray, seed: int, n_planes: int, n_tables: int, dim: int
) -> list[int]:
    """Query buckets plus every Hamming-1 neighbor per table (multiprobe)."""
    planes = hyperplanes(seed, n_planes * n_tables, dim).reshape(n_tables, n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    probes: list[int] = []
    for t in range(n_tables):
        bits = (planes[t] @ q_emb) >= 0.0
        base = int(bits @ weights) + (t << 24)
        probes.append(base)
        probes.extend(base ^ (1 << i) for i in range(n_planes))
    return probes


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Multi-table hyperplane-LSH top-k with Hamming-1 multiprobe.

    The scale path: data-side work is one Arrow UDF pass + an explode +
    a hash semi-join against the (tiny, literal) probe set — no all-pairs
    scoring. The single query row is resolved driver-side (a point lookup,
    the legitimate collect), then candidates are scored exactly.
    """
    row = embeddings.where(F.col("vec_id") == query_id).select("embedding").first()
    if row is None:
        raise ValueError(f"query vec_id {query_id} not found")
    q_emb = np.asarray(row["embedding"], dtype=np.float64)
    probes = _query_probes(q_emb, seed, n_planes, n_tables, dim)

    buckets_udf = make_multitable_bucket_udf(seed, n_planes, n_tables, dim)
    probe_lit = F.array(*[F.lit(int(p)).cast("int") for p in sorted(set(probes))])
    candidates = (
        embeddings.where(F.col("vec_id") != query_id)
        .withColumn("_buckets", buckets_udf("embedding"))
        .where(F.size(F.array_intersect(F.col("_buckets"), probe_lit)) > 0)
    )
    q_lit = F.array(*[F.lit(float(x)) for x in q_emb])
    return (
        candidates.select(
            "vec_id", cosine_col(F.col("embedding"), q_lit).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )
