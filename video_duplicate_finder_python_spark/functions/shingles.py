"""Word k-shingle hashing — fully JVM-side (whole-stage codegen).

The reference hashes min(10, frames) sampled frames per item
(/root/reference/src/core/hasher.py:30-42); the web-text analog is the set
of word k-grams per document. We hash each k-gram to 64 bits with Spark's
built-in ``xxhash64`` over an array slice, so the entire shingling stage
stays inside codegen — no Python in this hot path. The downstream MinHash /
SimHash / exact-Jaccard stages all consume this one ``array<long>`` column,
so shingles are computed exactly once per distinct document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingle_hashes_from_tokens(toks: Column, k: int) -> Column:
    """Distinct 64-bit hashes of all ``k``-shingles of a *materialized*
    token-array column.

    ``toks`` MUST be a column reference (not a ``split(...)`` expression):
    Catalyst inlines expression arguments into the higher-order-function
    lambda, so passing ``split(text)`` here re-tokenizes the whole document
    once per shingle index — O(tokens²) per document (measured 180 ms/doc
    at 2k tokens vs ~1 ms with a materialized column).

    - ``size(toks) >= k``: sliding window of k tokens, xxhash64 each.
    - ``0 < size(toks) < k``: one shingle over all tokens (a 3-word doc
      still gets a signature; mirrors the reference's min(10, frame_count)).
    - empty token array: empty result.
    """
    n_sh = F.size(toks) - F.lit(k - 1)
    sliding = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.xxhash64(F.slice(toks, i, F.lit(k))),
    )
    return F.when(F.size(toks) <= 0, F.array().cast("array<bigint>")).otherwise(
        F.when(n_sh >= 1, F.array_distinct(sliding)).otherwise(F.array(F.xxhash64(toks)))
    )


def with_shingles(df: DataFrame, text_col: str, k: int, out_col: str = "shingles") -> DataFrame:
    """Tokenize once into a materialized column, then shingle-hash it."""
    return (
        df.withColumn("_toks", F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .withColumn(
            "_toks",
            F.when(F.length(F.coalesce(F.col(text_col), F.lit(""))) == 0, F.array().cast("array<string>")).otherwise(F.col("_toks")),
        )
        .withColumn(out_col, shingle_hashes_from_tokens(F.col("_toks"), k))
        .drop("_toks")
    )


def shingle_hashes_col(text: Column, k: int) -> Column:
    """Single-expression variant for small inputs/tests. Prefer
    ``with_shingles`` on large documents (see shingle_hashes_from_tokens
    docstring for the quadratic-inlining pitfall this avoids)."""
    toks = F.split(text, " ")
    n_sh = F.size(toks) - F.lit(k - 1)
    sliding = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.xxhash64(F.slice(toks, i, F.lit(k))),
    )
    return F.when(text.isNull() | (F.length(text) == 0), F.array().cast("array<bigint>")).otherwise(
        F.when(n_sh >= 1, F.array_distinct(sliding)).otherwise(F.array(F.xxhash64(toks)))
    )
