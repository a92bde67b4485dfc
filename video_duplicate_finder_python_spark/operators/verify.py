"""Exact verification of candidate pairs (SURVEY O7/O8).

The reference scores candidates with a weighted string-Hamming similarity
and keeps pairs >= threshold (/root/reference/src/core/hasher.py:79-124,
comparator.py:79-80). Here the score the north rule fixes is *exact*
word-shingle Jaccard — computed fully JVM-side from the pre-computed
shingle-hash arrays (``array_intersect`` / ``array_union``), plus the exact
64-bit SimHash Hamming distance as ``bit_count(a ^ b)``.

Shape notes (both matter at 100 TB):
- ``cand_profiles`` carries ONLY ``(url, shingles, simhash)`` — document
  text never enters the big candidates⋈profiles join. Texts are joined in
  a second pass restricted to the (tiny) subset of substring-source
  candidates that FAILED the Jaccard test; only those pay the ~8 KB/doc
  shuffle and the anchored-common-span pandas UDF
  (functions/fingerprint.py:anchored_common_span_len).
- the scalar scores are persisted before branching, so the fast/slow split
  costs one execution of the scoring join, and what is persisted is the
  scalar-only frame (~tens of bytes/pair), not shingle arrays or text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions.fingerprint import anchored_common_span_len


def _make_span_udf(window: int, mask_bits: int):
    @F.pandas_udf(T.IntegerType())
    def span_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        # a missing text (caller passed a partial texts frame) yields a
        # NULL span, not 0 — downstream is_dup then falls back to the
        # Jaccard test alone instead of silently asserting "no shared span"
        return pd.Series(
            [
                None
                if a is None or b is None
                else anchored_common_span_len(a, b, window, mask_bits)
                for a, b in zip(text_a, text_b)
            ],
            dtype="Int32",
        )

    return span_udf


def verify_candidates(
    candidates: DataFrame,
    cand_profiles: DataFrame,
    cfg: DedupConfig,
    texts: DataFrame | None = None,
) -> DataFrame:
    """Score every candidate pair; flag duplicates.

    ``candidates(url_a, url_b, sources: array<string>[, lcs_hint: int])``
    — ``lcs_hint``, when present and non-null, is an exact LCS length a
    candidate source already proved (the suffix-array pass emits only
    pairs whose shared span it has walked), so those pairs skip the
    anchored-span recomputation entirely: the hint IS their ``lcs_len``.
    ``cand_profiles(url, shingles, simhash)`` — profiles for (at least)
    every url appearing in a candidate pair; shingles are recomputed for
    just the candidate url set upstream (candidates are a tiny fraction of
    the corpus, so that is far cheaper than persisting full shingle arrays
    through the signature checkpoint).
    ``texts(url, text)`` — consulted ONLY for substring-source pairs below
    the Jaccard threshold with no hint (the anchored-span check); pass
    None to skip the substring confirmation entirely (lcs_len stays null).
    → ``pairs(url_a, url_b, jaccard, hamming, lcs_len, sources, is_dup)``
    """
    hint_col = (
        F.col("lcs_hint").cast("int")
        if "lcs_hint" in candidates.columns
        else F.lit(None).cast("int")
    )
    candidates = candidates.select(
        "url_a", "url_b", "sources", hint_col.alias("_lcs_hint")
    )
    sig_a = cand_profiles.select(
        F.col("url").alias("url_a"),
        F.col("shingles").alias("_sh_a"),
        F.col("simhash").alias("_sim_a"),
    )
    sig_b = cand_profiles.select(
        F.col("url").alias("url_b"),
        F.col("shingles").alias("_sh_b"),
        F.col("simhash").alias("_sim_b"),
    )
    scored = (
        candidates.join(sig_a, "url_a")
        .join(sig_b, "url_b")
        .withColumn("_union", F.size(F.array_union("_sh_a", "_sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("_union") == 0, F.lit(0.0)).otherwise(
                F.size(F.array_intersect("_sh_a", "_sh_b"))
                / F.col("_union").cast("double")
            ),
        )
        .withColumn(
            "hamming", F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
        )
        .select("url_a", "url_b", "sources", "_lcs_hint", "jaccard", "hamming")
        # scalars only; branched 4 ways below (fast, needed, and the two
        # need_urls projections). A lazy localCheckpoint caches it like the
        # old persist did AND truncates the subtree out of the downstream
        # plan — the scoring join's lineage otherwise re-appears once per
        # branch in the final logical plan, and for callers that compose
        # verify into a larger lazy dataflow (the incremental probe) that
        # repetition is a measured Catalyst-planning bottleneck
        # (operators/incremental_probe.py docstring, plan-size note).
        .localCheckpoint(eager=False)
    )

    needs_lcs = (
        (F.col("jaccard") < cfg.jaccard_threshold)
        & (
            F.array_contains("sources", "suffix")
            | F.array_contains("sources", "suffix_array")
        )
        & F.col("_lcs_hint").isNull()
    )
    fast = scored.where(~needs_lcs).withColumn("lcs_len", F.col("_lcs_hint"))
    if texts is None:
        slow = scored.where(needs_lcs).withColumn(
            "lcs_len", F.lit(None).cast("int")
        )
    else:
        span_udf = _make_span_udf(cfg.cdc_window, cfg.cdc_mask_bits)
        needed = scored.where(needs_lcs)
        # ONE streamed scan of the corpus texts, semi-filtered by the
        # (tiny, broadcast) failed-substring url set — broadcast left-semi
        # is a supported build-right plan, unlike broadcasting the
        # preserved side of an outer join, so the corpus text is never
        # shuffled for a handful of pairs. The result is at most
        # 2·|needed| rows, so the two per-side joins below are
        # broadcast-trivially small.
        need_urls = (
            needed.select(F.col("url_a").alias("url"))
            .union(needed.select(F.col("url_b").alias("url")))
            .distinct()
        )
        t_small = texts.join(F.broadcast(need_urls), "url", "left_semi")
        tx_a = t_small.select(F.col("url").alias("url_a"), F.col("text").alias("_tx_a"))
        tx_b = t_small.select(F.col("url").alias("url_b"), F.col("text").alias("_tx_b"))
        # LEFT joins preserve every needs_lcs pair: a pair whose url is
        # absent from `texts` keeps its row with a NULL text → NULL
        # lcs_len, instead of vanishing from the result entirely
        slow = (
            needed.join(F.broadcast(tx_a), "url_a", "left")
            .join(F.broadcast(tx_b), "url_b", "left")
            .withColumn("lcs_len", span_udf(F.col("_tx_a"), F.col("_tx_b")))
            .drop("_tx_a", "_tx_b")
        )
    out = fast.unionByName(slow).withColumn(
        "is_dup",
        (F.col("jaccard") >= cfg.jaccard_threshold)
        | (F.coalesce(F.col("lcs_len"), F.lit(0)) >= cfg.substring_min_len),
    ).select(
        "url_a", "url_b", "jaccard", "hamming", "lcs_len", "sources", "is_dup"
    )
    # hand the persisted scalar frame to the caller for unpersist() once
    # the stage is materialized (same ownership pattern as bucket_pairs)
    out._vdf_cached = scored  # type: ignore[attr-defined]
    return out
