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
    """Build the struct-returning pandas UDF (minhash, simhash, n_shingles)."""
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
