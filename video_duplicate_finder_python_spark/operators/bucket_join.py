"""Bucketed candidate generation — the shared groupBy-driven pair emitter.

Spark-first generalization of the reference's hash-bucket candidate stage
(``_create_hash_buckets`` + per-bucket pairwise loop,
/root/reference/src/core/comparator.py:38-82): members that share a bucket
key become candidate pairs; singleton buckets are skipped (the reference's
``len(bucket_files) > 1`` check at comparator.py:31-33 becomes a window
count filter); and — unlike the reference, which pins one thread per hot
bucket — oversized buckets are *capped* with a deterministic row_number so
one adversarial key can't go quadratic (SURVEY.md §4 skew handling). Exact
duplicates are collapsed upstream (operators/exact.py), so an over-cap
bucket here is hash skew, not recall; drops are surfaced as a metric, never
silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "url",
    carry_cols: list[str] | None = None,
    max_bucket_size: int = 256,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Emit candidate pairs from rows sharing ``key_cols``.

    Returns ``(pairs, dropped, cached)`` where ``pairs`` has columns
    ``url_a, url_b`` (``url_a < url_b``) plus ``<c>_a / <c>_b`` for every
    carry column, and ``dropped`` is a 1-row DataFrame with the count of
    bucket members beyond the cap (a skew metric, SURVEY.md §4).

    ``persist=True`` caches the windowed bucket table (MEMORY_AND_DISK) so
    that running the ``pairs`` action and the ``dropped`` action doesn't
    execute the explode+window shuffle twice — Spark does not reuse shuffle
    output across separately-triggered jobs. The caller owns the returned
    ``cached`` handle and must ``unpersist()`` it after both actions ran
    (``cached`` is None when ``persist=False``). The cache is the banded
    table (≈ rows × bands × ~24 B) and spills to disk, so it stays viable
    at cluster scale; the alternative is accepting a 2× recompute.
    """
    carry_cols = carry_cols or []
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    sized = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_bsz", F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    )
    multi = sized.filter(F.col("_bsz") >= 2)
    cached = None
    if persist:
        multi = multi.persist(StorageLevel.MEMORY_AND_DISK)
        cached = multi
    kept = multi.filter(F.col("_rn") <= max_bucket_size)
    dropped = multi.filter(F.col("_rn") > max_bucket_size).select(
        F.count(F.lit(1)).alias("dropped_bucket_members")
    )

    left = kept.select(
        *key_cols,
        F.col(id_col).alias("url_a"),
        F.col("_rn").alias("_rn_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    right = kept.select(
        *key_cols,
        F.col(id_col).alias("url_b"),
        F.col("_rn").alias("_rn_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    pairs = (
        left.join(right, key_cols)
        .where(F.col("_rn_a") < F.col("_rn_b"))
        .drop("_rn_a", "_rn_b", *key_cols)
    )
    return pairs, dropped, cached
