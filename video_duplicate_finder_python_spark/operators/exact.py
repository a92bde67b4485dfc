"""Exact-duplicate collapse — linear-cost star edges, no quadratic pairs.

The reference's bucket key is md5(signature)[:8], so only byte-identical
signatures ever share a bucket (/root/reference/src/core/comparator.py:52-63
over the md5 from hasher.py:76) — i.e. its candidate generation is really
exact-duplicate grouping. We implement that class directly and *better*: an
exact group of size g yields g-1 star edges to its min-url representative
instead of g·(g-1)/2 pairs. This is also the skew kill-switch: boilerplate
pages (the classic Common-Crawl hot key; 2% of the synthetic corpus shares
one text) collapse to a single representative before any LSH banding, so
the hot signature never reaches the pair-emitting self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash_col(text_col) -> Column:
    """128-bit content identity: ``unhex(md5(text))`` (16-byte binary).

    Why 128 bits and not ``xxhash64``: at the 10^12-doc target the birthday
    bound over a 64-bit space yields tens of thousands of *expected* false
    merges (~n²/2^65 pairs), and a collision here silently fuses two
    unrelated documents into one "exact" group with no verification behind
    it. At 128 bits the same bound is ~10^-15 — the reference makes the
    identical width choice with its md5-based identity
    (/root/reference/src/core/hasher.py:76). Binary (unhex) rather than the
    hex string halves the shuffle-key bytes.
    """
    return F.unhex(F.md5(text_col))


def _with_content_hash(docs: DataFrame) -> DataFrame:
    """Reuse a persisted ``content_hash`` when the caller already paid for
    it (the pipeline's docs checkpoint stores it); hashing the full text
    column twice is an avoidable second full-corpus pass at 10^12 docs."""
    if "content_hash" in docs.columns:
        return docs
    return docs.withColumn("content_hash", content_hash_col(F.col("text")))


def exact_representatives(docs: DataFrame) -> DataFrame:
    """``docs(url, text, ...)`` → ``rep_docs``: one row per distinct
    ``content_hash`` — the min-url representative, with
    ``url, text, content_hash, group_size``.

    One shuffle on ``content_hash``; the follow-up join is co-partitioned.
    A ``content_hash`` column already present on ``docs`` (the pipeline
    persists it into the docs checkpoint) is reused as-is — no second
    full-corpus md5 pass.
    """
    hashed = _with_content_hash(docs)
    reps = hashed.groupBy("content_hash").agg(
        F.min("url").alias("rep_url"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        hashed.join(reps, "content_hash")
        .where(F.col("url") == F.col("rep_url"))
        .drop("rep_url")
    )


def exact_edges_from(docs: DataFrame, rep_docs: DataFrame) -> DataFrame:
    """``(u, v)`` member→representative star edges, derived from the
    already-materialized ``rep_docs``: only representatives of real
    duplicate groups (``group_size > 1``) join back against the docs — a
    join whose build side is the (small) dup-group set, not a re-run of
    the whole groupBy+join (the round-1 shape materialized that expensive
    lineage twice, once per stage checkpoint)."""
    dup_reps = rep_docs.where(F.col("group_size") > 1).select(
        "content_hash", F.col("url").alias("rep_url")
    )
    hashed = _with_content_hash(docs)
    return (
        hashed.join(dup_reps, "content_hash")
        .where(F.col("url") != F.col("rep_url"))
        .select(F.col("url").alias("u"), F.col("rep_url").alias("v"))
    )


def exact_duplicate_groups(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``docs(url, text, ...)`` → ``(rep_docs, exact_edges)``; see
    exact_representatives / exact_edges_from (composed here for callers
    that don't stage-checkpoint the intermediate)."""
    rep_docs = exact_representatives(docs)
    return rep_docs, exact_edges_from(docs, rep_docs)
