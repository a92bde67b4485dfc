"""Multimodal column plumbing: opaque binary media + typed metadata.

The Spark-side contract (schema, partition-preserving mapInPandas, Arrow
batch shapes) is real and tested; the actual codec step is stubbed because
image/audio libraries aren't in this container. ``decode_media`` raises
NotImplementedError for real codecs and offers a clearly-marked
deterministic fake (`codec="fake"`) that derives stable pseudo-features
from the bytes so downstream plumbing (feature columns, ANN over features)
can be exercised end-to-end.

Pattern: one ``mapInPandas`` over (key, media: binary) batches → rows of
(key, width, height, n_bytes, features: array<float>). mapInPandas (not a
scalar UDF) so one input row may expand to zero rows (undecodable media is
dropped, counted by the caller via row deltas) and batches stay columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)

N_FEATURES = 16


def _fake_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image/audio decoder: stable
    pseudo-dimensions and a 16-dim byte-histogram-ish feature vector.

    The pseudo-dimensions are a Knuth multiplicative hash of the byte
    LENGTH (not a cryptographic hash of the bytes) on purpose: every
    operation is exact 64-bit integer arithmetic that a SQL oracle can
    replay from ``octet_length(media)``, so the driver's DuckDB
    cross-check covers this mapInPandas path end-to-end
    (__spark_entry__.oracle_sql, round-6 upgrade from rows-only). The
    feature vector stays byte-content-sensitive via the histogram."""
    h = (len(data) * 2654435761) % 4294967296
    width = 64 + h % 192
    height = 64 + (h // 192) % 192
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        feats = np.zeros(N_FEATURES, dtype=np.float32)
    else:
        hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
        feats = (hist / arr.size).astype(np.float32)
    return width, height, feats


def decode_media(
    df: DataFrame,
    key_col: str = "url",
    media_col: str = "html",
    codec: str = "fake",
) -> DataFrame:
    """``df(key, media: binary, ...)`` → ``(key, width, height, n_bytes, features)``.

    codec="fake": deterministic stub (see module docstring).
    Any real codec name raises NotImplementedError — the container has no
    media libraries; plug a decoder into ``_fake_decode``'s seam on a real
    deployment.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: media libraries are not available in this "
            "environment; only the deterministic 'fake' stub is implemented"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"key": [], "width": [], "height": [], "n_bytes": [], "features": []}
            for key, media in zip(batch[key_col], batch[media_col]):
                if media is None:
                    continue  # undecodable → dropped (caller counts deltas)
                data = bytes(media)
                w, h, feats = _fake_decode(data)
                out["key"].append(key)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(data))
                out["features"].append([float(x) for x in feats])
            if out["key"]:  # empty frames get numpy dtypes Arrow can't cast
                yield pd.DataFrame(out)

    return df.select(key_col, media_col).mapInPandas(
        decode_batches, schema=MEDIA_FEATURES_SCHEMA
    )
