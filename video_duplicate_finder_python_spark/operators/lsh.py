"""MinHash-LSH band hashing → groupBy candidate generation (SURVEY O5/O6).

The principled generalization of the reference's md5[:8] bucketing
(/root/reference/src/core/comparator.py:52-63): the 128-perm MinHash is
sliced into b bands × r rows; each band is hashed with the JVM-side
``xxhash64`` (band id as seed separator); documents colliding in any band
become candidates. With b=16, r=8 a pair at Jaccard s collides with
probability 1-(1-s^8)^16 — ≈0.95 at s=0.8, →1 for exact duplicates — which
is what makes dup-pair recall ≥0.99 achievable *after* the exact class is
handled separately (operators/exact.py).

Band explode is a literal column array — no shuffle until the single
groupBy-driven self-join in bucket_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from .bucket_join import bucket_pairs


def explode_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """``signatures(url, minhash, ...)`` → ``bands(url, band_id, band_hash)``."""
    r = cfg.rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(F.slice("minhash", b * r + 1, r), F.lit(b)).alias("band_hash"),
        )
        for b in range(cfg.bands)
    ]
    return signatures.select(
        "url", F.explode(F.array(*band_structs)).alias("_band")
    ).select("url", "_band.band_id", "_band.band_hash")


def minhash_band_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    persist: bool = False,
    dedup: bool = True,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """→ ``(pairs(url_a, url_b), dropped_metric, cached)``.
    ``persist``/``cached`` semantics per bucket_join.bucket_pairs.

    A pair can collide in several bands; ``dedup=True`` keeps one row
    (SURVEY O6's global dropDuplicates). The pipeline keeps the default
    ``dedup=True``: a near-dup pair collides in up to ``bands`` bands, so
    deduping inside each source shrinks the downstream union-groupBy
    shuffle by that multiplicity — measured cheaper on duplicate-heavy web
    corpora than funneling the raw collision rows into the final groupBy
    (plans/pipeline.py:_candidates). Pass ``dedup=False`` only when a
    caller's own downstream aggregation already deduplicates."""
    bands = explode_bands(signatures, cfg)
    pairs, dropped, cached = bucket_pairs(
        bands,
        key_cols=["band_id", "band_hash"],
        max_bucket_size=cfg.max_bucket_size,
        persist=persist,
        salt_threshold=cfg.skew_salt_threshold,
        n_salts=cfg.skew_n_salts,
    )
    if dedup:
        pairs = pairs.dropDuplicates(["url_a", "url_b"])
    return pairs, dropped, cached
