"""Expand representative-level duplicate pairs to url-level pairs.

The exact-collapse stage (operators/exact.py) removes byte-identical
duplicates *before* signatures/LSH, so the verified ``pairs`` table only
relates group *representatives*. The reference, by contrast, reports pairs
between the underlying files themselves (duplicate_groups rows carry the
two file paths, /root/reference/src/core/database.py:49-60). This operator
recovers that file-level view:

- every rep-level pair ``(r1, r2, jaccard, ...)`` expands to the cross
  product of r1's and r2's exact-group members — valid because members
  share their representative's text byte-for-byte, so every expanded pair
  has *exactly* the representative pair's Jaccard/Hamming;
- members within one exact group form pairs at Jaccard 1.0 / Hamming 0
  (source tag ``exact``).

Scale note: the output is inherently pair-count-sized — a boilerplate
group of g members alone contributes g·(g-1)/2 within-group rows, so this
is an *optional reporting view*, not a pipeline stage; clustering consumes
the linear star edges instead (exact_edges → connected components). The
within-group part can be disabled for hot-key corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_pairs_through_reps(
    pairs: DataFrame,
    exact_edges: DataFrame,
    include_within_groups: bool = True,
) -> DataFrame:
    """``pairs(url_a, url_b, jaccard, hamming, lcs_len, sources, is_dup)``
    (rep-level, from verify) + ``exact_edges(u=member, v=rep)`` →
    url-level pairs with the same schema and ``url_a < url_b``.
    """
    # membership(member, rep): star edges plus each rep's identity row.
    # Endpoints of `pairs` with no exact group map to themselves via the
    # coalesce in the left joins below — no universe scan needed.
    membership = exact_edges.select(
        F.col("u").alias("member"), F.col("v").alias("rep")
    ).unionByName(
        exact_edges.select(F.col("v").alias("member"), F.col("v").alias("rep")).distinct()
    )

    ma = membership.select(
        F.col("rep").alias("url_a"), F.col("member").alias("_m_a")
    )
    mb = membership.select(
        F.col("rep").alias("url_b"), F.col("member").alias("_m_b")
    )
    cross = (
        pairs.join(ma, "url_a", "left")
        .join(mb, "url_b", "left")
        .select(
            F.coalesce("_m_a", "url_a").alias("_a"),
            F.coalesce("_m_b", "url_b").alias("_b"),
            "jaccard",
            "hamming",
            "lcs_len",
            "sources",
            "is_dup",
        )
        .select(
            F.least("_a", "_b").alias("url_a"),
            F.greatest("_a", "_b").alias("url_b"),
            "jaccard",
            "hamming",
            "lcs_len",
            "sources",
            "is_dup",
        )
    )
    if not include_within_groups:
        return cross

    g1 = membership.select("rep", F.col("member").alias("_m_a"))
    g2 = membership.select("rep", F.col("member").alias("_m_b"))
    within = (
        g1.join(g2, "rep")
        .where(F.col("_m_a") < F.col("_m_b"))
        .select(
            F.col("_m_a").alias("url_a"),
            F.col("_m_b").alias("url_b"),
            F.lit(1.0).alias("jaccard"),
            F.lit(0).alias("hamming"),
            F.lit(None).cast("int").alias("lcs_len"),
            F.array(F.lit("exact")).alias("sources"),
            F.lit(True).alias("is_dup"),
        )
    )
    # no dropDuplicates: a member pair can arise from exactly one source —
    # its two reps' pair (different groups) or its own group (same group) —
    # so a dedup shuffle over the output-sized table would be pure cost.
    return cross.unionByName(within)
