"""Perceptual frame hashing — the reference's actual signature kernel,
re-expressed as vectorized NumPy over Arrow batches.

The reference samples ``min(10, frame_count)`` frames at regular intervals
from each video and computes an imagehash-style 64-bit dHash + 64-bit pHash
per frame (/root/reference/src/core/hasher.py:30-67). This module keeps
that algorithm intact — DCT-II low-frequency sign bits for pHash, adjacent
column gradients for dHash, regular-interval frame sampling — and fakes
ONLY the codec step, exactly like functions/multimodal.decode_media: the
container has no cv2/PIL, so ``codec="fake"`` derives a deterministic
32×32 grayscale "frame" from each sampled 1024-byte window of the media
bytes (1024 bytes = 32×32 pixels, so a byte-level perturbation perturbs
pixels locally and the perceptual hashes respond the way they would on
real frames: identical bytes → identical hashes, small diffs → small
Hamming distance). A real deployment plugs a decoder into the
``sample_frames`` seam; any other codec name raises NotImplementedError.

Everything here is batch-vectorized: the DCT is one einsum over EVERY
frame of an Arrow batch stacked into a single (total_frames, 32, 32)
array — no per-frame Python in the hot path.
"""

from __future__ import annotations

import numpy as np

FRAME_SIDE = 32                       # fake frame: 32x32 gray pixels
FRAME_BYTES = FRAME_SIDE * FRAME_SIDE  # = 1024, one "frame" per KiB
MAX_FRAMES = 10                       # reference: min(10, frame_count)
HASH_SIDE = 8                         # 8x8 low-freq block -> 64-bit hash


def _dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II matrix (scipy.fftpack.dct type-2 norm=None
    convention, the one imagehash applies along both axes):
    ``D[k, i] = 2 * cos(pi * k * (2i + 1) / (2n))``."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    return 2.0 * np.cos(np.pi * k * (2 * i + 1) / (2 * n))


_DCT32 = _dct_matrix(FRAME_SIDE)

# dHash column resample boundaries: 32 columns -> HASH_SIDE+1 = 9 blocks
# (the reference's hash_size+1-wide resize, hasher.py:64), block j =
# columns [floor(j*32/9), floor((j+1)*32/9))
_DH_STARTS = (np.arange(HASH_SIDE + 1) * FRAME_SIDE) // (HASH_SIDE + 1)
_DH_WIDTHS = np.diff(np.append(_DH_STARTS, FRAME_SIDE)).astype(np.float64)


def sample_frames(data: bytes, max_frames: int = MAX_FRAMES) -> np.ndarray:
    """Deterministic fake decode: regular-interval frame sampling.

    Mirrors the reference's sampler (hasher.py:30-42): ``frame_count`` is
    the media's total frame count (here: one frame per 1024-byte window,
    ≥1), ``n = min(max_frames, frame_count)`` frames are taken at
    positions ``int(i / n * frame_count)``. Returns (n, 32, 32) uint8.
    """
    frame_count = max(1, len(data) // FRAME_BYTES)
    n = min(max_frames, frame_count)
    frames = np.zeros((n, FRAME_BYTES), dtype=np.uint8)
    raw = np.frombuffer(data, dtype=np.uint8)
    for i in range(n):
        off = int(i / n * frame_count) * FRAME_BYTES
        window = raw[off : off + FRAME_BYTES]
        frames[i, : window.size] = window
    return frames.reshape(n, FRAME_SIDE, FRAME_SIDE)


def _pack_bits64(bits: np.ndarray) -> np.ndarray:
    """(n, 64) bool -> (n,) int64, MSB-first (bit 0 of the hash is the
    high bit — fixed order, shared by both hashes and the SQL helpers)."""
    packed = np.packbits(bits, axis=1)  # (n, 8) uint8, MSB-first per byte
    return packed.reshape(-1, 8).view(">u8").ravel().astype(np.uint64).view(np.int64)


def phash64_batch(frames: np.ndarray) -> np.ndarray:
    """imagehash-style pHash over a (n, 32, 32) frame stack -> (n,) int64.

    2-D DCT-II (one einsum for the whole stack), keep the top-left 8x8
    low-frequency block, threshold at its median (hasher.py:65 via
    imagehash.phash semantics)."""
    f = frames.astype(np.float64)
    dct = np.einsum("ki,nij,lj->nkl", _DCT32, f, _DCT32, optimize=True)
    low = dct[:, :HASH_SIDE, :HASH_SIDE].reshape(len(frames), -1)
    med = np.median(low, axis=1, keepdims=True)
    return _pack_bits64(low > med)


def dhash64_batch(frames: np.ndarray) -> np.ndarray:
    """imagehash-style dHash over a (n, 32, 32) frame stack -> (n,) int64.

    Block-mean resample to 8 rows x 9 cols, then adjacent-column gradient
    bits (hasher.py:64 via imagehash.dhash semantics)."""
    f = frames.astype(np.float64)
    # rows: 32 -> 8 exact blocks of 4; cols: 32 -> 9 blocks of width 3/4
    rows = f.reshape(len(frames), HASH_SIDE, FRAME_SIDE // HASH_SIDE, FRAME_SIDE).mean(
        axis=2
    )
    cols = np.add.reduceat(rows, _DH_STARTS, axis=2) / _DH_WIDTHS
    bits = (cols[:, :, 1:] > cols[:, :, :-1]).reshape(len(frames), -1)
    return _pack_bits64(bits)


def frame_hashes_for_docs(
    payloads: list[bytes], max_frames: int = MAX_FRAMES
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized batch kernel: all frames of all docs in one DCT.

    Returns ``(counts, phashes, dhashes)`` where ``counts[d]`` is doc d's
    sampled frame count and the hash arrays are the concatenation of every
    doc's per-frame hashes in doc order (split with ``np.cumsum(counts)``).
    """
    stacks = [sample_frames(p, max_frames) for p in payloads]
    counts = np.array([s.shape[0] for s in stacks], dtype=np.int64)
    if not stacks:
        empty = np.empty(0, dtype=np.int64)
        return counts, empty, empty
    allframes = np.concatenate(stacks, axis=0)
    return counts, phash64_batch(allframes), dhash64_batch(allframes)
