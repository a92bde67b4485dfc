"""Distributed deterministic synthetic corpus (bench scale).

Unlike corpus.py (sequential RNG, convenient for small oracle-checked
fixtures), every document here is a pure function of ``(seed, idx)`` —
so generation runs as ``mapInPandas`` over ``spark.range(n_docs)`` with no
driver-side materialization and no cross-row dependency, which is what
lets the same generator produce a 10^8-row corpus on a real cluster.

Duplicate taxonomy mirrors corpus.py/FIXTURES.md:
- base docs at indices where ``idx % 100 >= 32`` (plus a guaranteed-base
  prefix); exact/near/substring dups reference a base index derived
  deterministically from their own idx and regenerate the base text
  on the fly (cheap: one extra rng stream).
- one boilerplate hot cluster (~2%) as the LSH skew trap.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from .corpus import _BOILERPLATE, _role_of, _wrap_html, VOCAB_SIZE, _vocab

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _base_text(base_idx: int, seed: int, vocab: np.ndarray) -> str:
    rng = np.random.default_rng([seed, base_idx])
    n_words = int(rng.integers(50, 2001))
    return " ".join(vocab[rng.integers(0, VOCAB_SIZE, size=n_words)].tolist())


def _pick_base(idx: int, n_docs: int, rng: np.random.Generator) -> int:
    """A deterministic base index < idx (guaranteed-base prefix ensures one
    always exists)."""
    lo = max(4, n_docs // 3)
    for _ in range(8):
        cand = int(rng.integers(0, min(idx, n_docs)))
        if cand < lo or _role_of(cand, n_docs) == "unique":
            return cand if cand < idx else idx - 1
    return 0


def gen_doc(idx: int, n_docs: int, seed: int, vocab: np.ndarray) -> tuple[str, str, str]:
    """(role, text, lang) for one index — pure function of (seed, idx)."""
    role = _role_of(idx, n_docs)
    rng = np.random.default_rng([seed, idx, 7])
    if role == "boilerplate":
        text = _BOILERPLATE
    elif role == "exact":
        text = _base_text(_pick_base(idx, n_docs, rng), seed, vocab)
    elif role == "near":
        toks = _base_text(_pick_base(idx, n_docs, rng), seed, vocab).split(" ")
        rate = float(rng.uniform(0.001, 0.03))
        n_mut = max(1, int(len(toks) * rate))
        pos = rng.choice(len(toks), size=min(n_mut, len(toks)), replace=False)
        for p in pos:
            toks[int(p)] = str(vocab[int(rng.integers(0, VOCAB_SIZE))])
        text = " ".join(toks)
    elif role == "substring":
        src_toks = _base_text(_pick_base(idx, n_docs, rng), seed, vocab).split(" ")
        span_len = int(rng.integers(90, 200))
        if len(src_toks) <= span_len:
            span = src_toks
        else:
            start = int(rng.integers(0, len(src_toks) - span_len))
            span = src_toks[start : start + span_len]
        pre = vocab[rng.integers(0, VOCAB_SIZE, size=int(rng.integers(80, 300)))]
        suf = vocab[rng.integers(0, VOCAB_SIZE, size=int(rng.integers(80, 300)))]
        text = " ".join([*pre.tolist(), *span, *suf.tolist()])
    else:
        text = _base_text(idx, seed, vocab)
    mod = idx % 20
    lang = "de" if mod == 18 else ("fr" if mod == 19 else "en")
    return role, text, lang


def generate_pages_distributed(spark, n_docs: int, seed: int = 42, partitions: int = 64):
    """Deterministic pages DataFrame generated on the executors."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = np.array(_vocab())
        for batch in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for idx in batch["id"]:
                i = int(idx)
                _, text, lang = gen_doc(i, n_docs, seed, vocab)
                rows["url"].append(f"https://site{i % 10}.example/page/{i}")
                rows["warc_ts"].append(_EPOCH + timedelta(seconds=i))
                rows["html"].append(_wrap_html(i, text))
                rows["text"].append(text)
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=schema)
    )
