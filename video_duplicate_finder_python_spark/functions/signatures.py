"""MinHash + SimHash signature computation — one Arrow-batched pandas UDF.

This is the Spark analog of the reference's per-item signature map
(``compute_video_hash``, /root/reference/src/core/hasher.py:14-54): instead
of a composite hash *string* per file, each document gets typed columns —
``minhash: array<int>`` (num_perm values) and ``simhash: bigint`` (64-bit).

All math is NumPy over the whole Arrow batch: the 128-perm MinHash is one
``(perms × shingles)`` broadcasted multiply-add + min per doc, the SimHash
is a bit-matrix majority vote. No per-row Python hashing — shingle hashes
arrive pre-computed (JVM xxhash64, see shingles.py).

MinHash family: h_i(x) = (a_i * x + b_i) mod 2^64 (wraparound), keep the
top 31 bits of the minimum → int32. The (a·x+b) multiply-shift family over
2^64 with odd ``a`` is a standard practical choice; parameters derive
deterministically from the config seed so every run / the oracle / a real
cluster agree bit-for-bit.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# minhash value for docs with zero shingles (exact-dup collapse upstream
# means at most one such representative exists; must never collide with a
# real doc's signature on every perm, which a constant sentinel satisfies)
EMPTY_SENTINEL = np.int32(2**31 - 1)

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("minhash", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("n_shingles", T.LongType(), False),
    ]
)


def minhash_params(seed: int, num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors; a forced odd (invertible mod 2^64)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_of(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash int32 vector of one shingle-hash set (shared with the oracle)."""
    if shingles.size == 0:
        return np.full(a.shape[0], EMPTY_SENTINEL, dtype=np.int32)
    h = shingles.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        vals = a[:, None] * h[None, :] + b[:, None]  # uint64 wraparound
    return (vals.min(axis=1) >> np.uint64(33)).astype(np.int32)


def simhash_of(shingles: np.ndarray) -> int:
    """64-bit SimHash of one shingle-hash set (majority vote per bit),
    returned as a signed int64 (Spark LongType)."""
    if shingles.size == 0:
        return 0
    h = shingles.astype(np.uint64, copy=False)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
    maj = bits.sum(axis=0) * 2 >= h.size
    packed = 0
    for i in np.flatnonzero(maj):
        packed |= 1 << int(i)
    return packed - (1 << 64) if packed >= (1 << 63) else packed


def make_signature_udf(seed: int, num_perm: int):
    """Build the struct-returning pandas UDF (minhash, simhash, n_shingles)
    over a pre-computed shingle-hash array column."""
    a_params, b_params = minhash_params(seed, num_perm)

    @F.pandas_udf(SIGNATURE_SCHEMA)
    def signature_udf(shingles: pd.Series) -> pd.DataFrame:
        minhashes: list[np.ndarray] = []
        simhashes: list[int] = []
        counts: list[int] = []
        for row in shingles:
            h = np.asarray(row if row is not None else [], dtype=np.int64).view(np.uint64)
            minhashes.append(minhash_of(h, a_params, b_params))
            simhashes.append(simhash_of(h))
            counts.append(int(h.size))
        return pd.DataFrame(
            {"minhash": minhashes, "simhash": simhashes, "n_shingles": counts}
        )

    return signature_udf


# --------------------------------------------------------------------------
# text → shingle hashes, NumPy path
#
# Why not JVM-side? The natural Spark expression —
# transform(sequence(...), i -> xxhash64(slice(tokens, i, k))) — runs on
# the *interpreted* higher-order-function path (no codegen), which in
# local mode scales INVERSELY with thread count (measured: 13s at
# local[2] → 114s at local[8] for the same 20k docs; meanwhile the
# Arrow/NumPy UDFs scaled 9x). Token hashing below is batch-cached
# (web-text vocabulary is zipfian, so most lookups hit the cache) and the
# k-gram hash is a vectorized rolling polynomial — ~1ms/doc at 2k tokens.
# --------------------------------------------------------------------------
_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _token_hash(token: str) -> int:
    return int.from_bytes(blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def shingle_hashes_np(text: str | None, k: int, cache: dict[str, int]) -> np.ndarray:
    """Distinct 64-bit k-shingle hashes of ``text`` (uint64 array).

    Same semantics as the reference's per-item frame sampling analog
    (SURVEY O2): <k tokens → one shingle over all tokens; empty → empty.
    """
    if not text:
        return np.empty(0, dtype=np.uint64)
    toks = text.split(" ")
    n = len(toks)
    h = np.empty(n, dtype=np.uint64)
    get = cache.get
    for i, t in enumerate(toks):
        v = get(t)
        if v is None:
            v = _token_hash(t)
            cache[t] = v
        h[i] = v
    if n < k:
        k = n  # single shingle over everything
    out = np.zeros(n - k + 1, dtype=np.uint64)
    pw = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k - 1, -1, -1):
            out += h[j : j + n - k + 1] * pw
            pw = pw * _POLY_BASE
    return np.unique(out)


def make_text_signature_udf(seed: int, num_perm: int, k: int):
    """text → (minhash, simhash, n_shingles), shingling included."""
    a_params, b_params = minhash_params(seed, num_perm)

    @F.pandas_udf(SIGNATURE_SCHEMA)
    def text_signature_udf(text: pd.Series) -> pd.DataFrame:
        cache: dict[str, int] = {}
        minhashes, simhashes, counts = [], [], []
        for t in text:
            sh = shingle_hashes_np(t, k, cache)
            minhashes.append(minhash_of(sh, a_params, b_params))
            simhashes.append(simhash_of(sh))
            counts.append(int(sh.size))
        return pd.DataFrame(
            {"minhash": minhashes, "simhash": simhashes, "n_shingles": counts}
        )

    return text_signature_udf


def make_shingles_udf(k: int):
    """text → array<long> of distinct shingle hashes (for the verification
    stage's exact Jaccard over candidate docs)."""

    @F.pandas_udf(T.ArrayType(T.LongType(), False))
    def shingles_udf(text: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        return pd.Series(
            [shingle_hashes_np(t, k, cache).view(np.int64) for t in text]
        )

    return shingles_udf
