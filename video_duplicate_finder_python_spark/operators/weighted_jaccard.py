"""Weighted (multiset) Jaccard verification over candidate pairs.

The set-Jaccard verifier (operators/verify.py, SURVEY O7) treats a document
as the SET of its shingles, so a page that repeats one boilerplate paragraph
fifty times looks identical to a page containing it once. Weighted Jaccard
scores the token MULTISETS instead:

    WJ(a, b) = sum_t min(cnt_a(t), cnt_b(t)) / sum_t max(cnt_a(t), cnt_b(t))

which is the n-gram-frequency variant of the brief's "n-gram Jaccard" dedup
axis (reference analog: the per-item composite signature comparison in
/root/reference/src/core/comparator.py:52-63 scores whole-item similarity;
this operator is its frequency-aware text twin).

Scale shape: everything is candidate-pair-scoped and pure JVM — one
explode+groupBy to build per-doc token counts (shuffles on (id, token)),
then two hash joins that fan each pair out by its token count. No UDFs, no
driver loops; cost is linear in the total token mass of the CANDIDATE pairs,
never all-pairs. At 100 TB the pairs input comes from the LSH/suffix
candidate stages, so the fan-out is bounded by candidate volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, cnt) per-document whitespace-token multiset."""
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy("_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score candidate ``pairs`` (doc_a, doc_b) with multiset Jaccard.

    Returns (doc_a, doc_b, w_jaccard: double). Using the identity
    sum(max) = total_a + total_b - sum(min), only the intersection join is
    needed; pairs sharing no token score 0.0 (coalesced, not dropped).
    The division is a single IEEE-754 op, so the value is bit-identical to
    any engine computing the same integers (the DuckDB oracle relies on
    this, like verify.py's set-Jaccard does).
    """
    # the token-count table feeds three consumers (totals + both join
    # sides); the lazy checkpoint computes the explode+groupBy once and
    # truncates its subtree out of every downstream plan (r7, same rule
    # as the probe/verify plan-diamond fix)
    tc = token_counts(docs, id_col, text_col).localCheckpoint(eager=False)
    totals = tc.groupBy("_id").agg(F.sum("cnt").alias("tot"))

    a_counts = tc.select(
        F.col("_id").alias("doc_a"), "tok", F.col("cnt").alias("cnt_a")
    )
    b_counts = tc.select(
        F.col("_id").alias("doc_b"), "tok", F.col("cnt").alias("cnt_b")
    )
    inter = (
        pairs.join(a_counts, "doc_a")
        .join(b_counts, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("cnt_a", "cnt_b")).alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .withColumn("inter", F.coalesce("inter", F.lit(0)))
        .join(totals.select(F.col("_id").alias("doc_a"), F.col("tot").alias("tot_a")), "doc_a")
        .join(totals.select(F.col("_id").alias("doc_b"), F.col("tot").alias("tot_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("tot_a") + F.col("tot_b") - F.col("inter")).cast("double")
            ).alias("w_jaccard"),
        )
    )
