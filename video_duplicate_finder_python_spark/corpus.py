"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1/F2/F3).

Seeded, no wall-clock, no external data. Reproduces bit-for-bit from
``(seed, n_docs)``. The planted duplicate taxonomy mirrors what the
reference detects (exact-signature groups via md5-bucket candidate
generation, /root/reference/src/core/comparator.py:52-63), what its
similarity function scores (near duplicates,
/root/reference/src/core/hasher.py:79-124), plus the substring class the
north rule adds:

- exact      (~10%): byte-identical text under a different url
- near       (~15%): 0.1–3% of tokens substituted from a base doc
- substring  (~5%) : a >=500-char verbatim span of a base doc embedded in
                     otherwise-unique text
- boilerplate(~2%) : one hot cluster sharing a single "empty page" text
                     (the skew trap for LSH banding)
- unique     (rest): no duplicate partner
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

VOCAB_SIZE = 4000
_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

_BOILERPLATE = "this page intentionally left blank please enable javascript to continue " * 12


def _vocab() -> list[str]:
    return [f"tok{i:04d}" for i in range(VOCAB_SIZE)]


@dataclass
class Corpus:
    pages: pd.DataFrame          # url, warc_ts, html, text, lang
    truth_pairs: pd.DataFrame    # url_a, url_b, kind
    roles: pd.DataFrame          # url, role  (for tests/metrics)


def _wrap_html(i: int, text: str) -> bytes:
    return (
        b"<html><head><title>t" + str(i).encode() + b"</title></head><body><p>"
        + text.encode("utf-8")
        + b"</p></body></html>"
    )


def _role_of(i: int, n_docs: int) -> str:
    # the first 1/3 of indices are guaranteed bases so dups always have a source
    if i < max(4, n_docs // 3):
        return "unique"
    r = i % 100
    if r < 10:
        return "exact"
    if r < 25:
        return "near"
    if r < 30:
        return "substring"
    if r < 32:
        return "boilerplate"
    return "unique"


def generate_corpus(seed: int = 42, n_docs: int = 240, n_sites: int = 10) -> Corpus:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    roles: list[str] = []
    pair_rows: list[tuple[str, str, str]] = []

    base_indices: list[int] = []  # indices usable as duplication sources
    first_boiler: int | None = None

    for i in range(n_docs):
        url = f"https://site{i % n_sites}.example/page/{i}"
        role = _role_of(i, n_docs)

        if role == "boilerplate":
            text = _BOILERPLATE
            if first_boiler is None:
                first_boiler = i
            else:
                pair_rows.append((urls[first_boiler], url, "exact"))
        elif role == "exact":
            src = int(rng.choice(base_indices))
            text = texts[src]
            pair_rows.append((urls[src], url, "exact"))
        elif role == "near":
            src = int(rng.choice(base_indices))
            toks = texts[src].split(" ")
            rate = float(rng.uniform(0.001, 0.03))
            n_mut = max(1, int(len(toks) * rate))
            pos = rng.choice(len(toks), size=min(n_mut, len(toks)), replace=False)
            for p in pos:
                toks[int(p)] = str(vocab[int(rng.integers(0, VOCAB_SIZE))])
            text = " ".join(toks)
            pair_rows.append((urls[src], url, "near"))
        elif role == "substring":
            src = int(rng.choice(base_indices))
            src_toks = texts[src].split(" ")
            span_len = int(rng.integers(90, 200))  # ~90+ tokens -> >=500 chars
            if len(src_toks) <= span_len:
                span = src_toks
            else:
                start = int(rng.integers(0, len(src_toks) - span_len))
                span = src_toks[start : start + span_len]
            pre = vocab[rng.integers(0, VOCAB_SIZE, size=int(rng.integers(80, 300)))]
            suf = vocab[rng.integers(0, VOCAB_SIZE, size=int(rng.integers(80, 300)))]
            text = " ".join([*pre.tolist(), *span, *suf.tolist()])
            pair_rows.append((urls[src], url, "substring"))
        else:
            n_words = int(rng.integers(50, 2001))
            text = " ".join(vocab[rng.integers(0, VOCAB_SIZE, size=n_words)].tolist())
            base_indices.append(i)

        mod = i % 20
        lang = "de" if mod == 18 else ("fr" if mod == 19 else "en")
        urls.append(url)
        texts.append(text)
        langs.append(lang)
        roles.append(role)

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [_EPOCH + timedelta(seconds=i) for i in range(n_docs)],
            "html": [_wrap_html(i, t) for i, t in enumerate(texts)],
            "text": texts,
            "lang": langs,
        }
    )
    truth = pd.DataFrame(pair_rows, columns=["url_a", "url_b", "kind"])
    # canonical orientation url_a < url_b
    flip = truth["url_a"] > truth["url_b"]
    truth.loc[flip, ["url_a", "url_b"]] = truth.loc[flip, ["url_b", "url_a"]].values
    roles_df = pd.DataFrame({"url": urls, "role": roles})
    return Corpus(pages=pages, truth_pairs=truth, roles=roles_df)


def pages_spark_df(spark, corpus: Corpus, partitions: int = 8):
    """Corpus → Spark DataFrame with the BASELINE.json input_hint schema."""
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
    return spark.createDataFrame(corpus.pages, schema=schema).repartition(partitions)
