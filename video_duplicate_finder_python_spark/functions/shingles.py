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

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingle_hashes_col(text: Column, k: int) -> Column:
    """Distinct 64-bit hashes of all word ``k``-shingles of ``text``.

    - ``size(tokens) >= k``: sliding window of k tokens, xxhash64 each.
    - ``0 < size(tokens) < k``: one shingle over all tokens (a 3-word doc
      still gets a signature; mirrors the reference's min(10, frame_count)).
    - empty/null text: empty array.
    """
    toks = F.split(text, " ")
    n_sh = F.size(toks) - F.lit(k - 1)
    sliding = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.xxhash64(F.slice(toks, i, F.lit(k))),
    )
    return F.when(text.isNull() | (F.length(text) == 0), F.array().cast("array<bigint>")).otherwise(
        F.when(n_sh >= 1, F.array_distinct(sliding)).otherwise(F.array(F.xxhash64(toks)))
    )
