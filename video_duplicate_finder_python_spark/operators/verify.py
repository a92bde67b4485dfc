"""Exact verification of candidate pairs (SURVEY O7/O8).

The reference scores candidates with a weighted string-Hamming similarity
and keeps pairs >= threshold (/root/reference/src/core/hasher.py:79-124,
comparator.py:79-80). Here the score the north rule fixes is *exact*
word-shingle Jaccard — computed fully JVM-side from the pre-computed
shingle-hash arrays (``array_intersect`` / ``array_union``), plus the exact
64-bit SimHash Hamming distance as ``bit_count(a ^ b)``. Python appears
only on the slow path: the chunk-anchored common-span check
(functions/fingerprint.py:anchored_common_span_len) runs solely on
substring-source candidates that *failed* the Jaccard test, an
Arrow-batched pandas UDF over an already-small DataFrame. (The exact
suffix-automaton LCS in functions/lcs.py is the oracle's independent
ground truth.)
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
        return pd.Series(
            [
                anchored_common_span_len(a or "", b or "", window, mask_bits)
                for a, b in zip(text_a, text_b)
            ],
            dtype="int32",
        )

    return span_udf


def verify_candidates(
    candidates: DataFrame,
    cand_profiles: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """Score every candidate pair; flag duplicates.

    ``candidates(url_a, url_b, sources: array<string>)``
    ``cand_profiles(url, shingles, simhash, text)`` — profiles for (at
    least) every url appearing in a candidate pair. The pipeline builds
    this by semi-joining rep_docs to the candidate url set and recomputing
    shingles just for those docs: candidates are a tiny fraction of the
    corpus, so recomputation is far cheaper than persisting the full
    shingle arrays through the signature checkpoint (which would roughly
    double the checkpoint's size at 10^12-doc scale).
    → ``pairs(url_a, url_b, jaccard, hamming, lcs_len, sources, is_dup)``

    ``lcs_len`` is only materialized (non-null) for substring-source pairs
    below the Jaccard threshold; other pairs never pay for it.
    """
    sig_a = cand_profiles.select(
        F.col("url").alias("url_a"),
        F.col("shingles").alias("_sh_a"),
        F.col("simhash").alias("_sim_a"),
        F.col("text").alias("_tx_a"),
    )
    sig_b = cand_profiles.select(
        F.col("url").alias("url_b"),
        F.col("shingles").alias("_sh_b"),
        F.col("simhash").alias("_sim_b"),
        F.col("text").alias("_tx_b"),
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
    )

    needs_lcs = (F.col("jaccard") < cfg.jaccard_threshold) & F.array_contains(
        "sources", "suffix"
    )
    span_udf = _make_span_udf(cfg.cdc_window, cfg.cdc_mask_bits)
    # single pass, no filter/union branching: the old fast/slow split
    # re-ran the candidates⋈profiles join twice (once per branch). The UDF
    # is fed NULL texts for non-substring rows (the inner `when`s), so it
    # returns immediately for them, and the outer `when` nulls the result —
    # same output, one execution of the scored lineage.
    out = scored.withColumn(
        "lcs_len",
        F.when(
            needs_lcs,
            span_udf(
                F.when(needs_lcs, F.col("_tx_a")),
                F.when(needs_lcs, F.col("_tx_b")),
            ),
        ).cast("int"),
    ).withColumn(
        "is_dup",
        (F.col("jaccard") >= cfg.jaccard_threshold)
        | (F.coalesce(F.col("lcs_len"), F.lit(0)) >= cfg.substring_min_len),
    )
    return out.select(
        "url_a", "url_b", "jaccard", "hamming", "lcs_len", "sources", "is_dup"
    )
