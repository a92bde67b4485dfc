"""Substring-duplicate candidates via content-defined-chunk fingerprints.

No counterpart in the reference (SURVEY.md §2 gap list): catches long
verbatim substring duplicates that whole-doc shingle-LSH misses. Candidate
generation is a plain explode + groupBy on CDC fingerprints
(functions/fingerprint.py) — embarrassingly parallel with no
cross-partition recall hole, unlike a per-partition suffix array.
Confirmation (exact LCS >= substring_min_len) happens in verify.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from .bucket_join import bucket_pairs


def substring_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    persist: bool = False,
    dedup: bool = True,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """``signatures(url, fingerprints)`` → ``(pairs, dropped, cached)``.
    The pipeline keeps the default ``dedup=True`` — a pair sharing several
    CDC chunks collides once per chunk, and per-source dedup shrinks the
    union shuffle (measured; see lsh.minhash_band_candidates)."""
    fps = signatures.select("url", F.explode("fingerprints").alias("fp"))
    pairs, dropped, cached = bucket_pairs(
        fps,
        key_cols=["fp"],
        max_bucket_size=cfg.max_bucket_size,
        persist=persist,
        salt_threshold=cfg.skew_salt_threshold,
        n_salts=cfg.skew_n_salts,
    )
    if dedup:
        pairs = pairs.dropDuplicates(["url_a", "url_b"])
    return pairs, dropped, cached
