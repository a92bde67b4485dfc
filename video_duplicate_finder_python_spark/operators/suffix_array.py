"""Per-group generalized suffix-array substring-duplicate pass (SURVEY §2
gap list; the north rule names the suffix-array pass explicitly).

Complements the CDC fingerprint path (operators/substring.py): CDC is the
corpus-wide, no-recall-hole candidate generator; this operator is the
*within-group exhaustive* one — inside a group it finds EVERY pair of
documents sharing a verbatim substring of at least ``min_len`` characters
(no sampling/anchoring gap), at the price of group-local scope. The
natural group key on web corpora is the site/host (``source`` on the
documents table, ``parse_url(url, 'HOST')`` on real pages): verbatim
template/boilerplate reuse is overwhelmingly intra-site, which is exactly
the duplication class LSH's whole-document Jaccard misses.

Scale model (100 TB): one shuffle on the group key; each group is
processed independently inside ``applyInPandas`` with NumPy
prefix-doubling suffix-array construction (O(n log² n) per group,
vectorized) + Kasai LCP. Group size is the unit of memory, so skewed
groups are capped deterministically (sorted by url, first
``max_docs_per_group``) — the same counted-drop contract as the LSH
bucket cap. Reference parity: no counterpart in the reference at all
(SURVEY.md §2 "Suffix-array substring pass"); the published analog is the
suffix-array dedup of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), here group-scoped instead of
corpus-global.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.lcs import longest_common_substring_len

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("lcs_len", T.IntegerType(), False),
    ]
)


def build_suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence via prefix doubling — each round is
    one ``np.lexsort`` over (rank, rank-shifted-by-k), so construction is
    vectorized end-to-end; O(n log² n) with no Python-per-element loop."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # explicit copy: asarray would alias an int64 input, and the doubling
    # loop writes through this buffer — aliasing would clobber the
    # caller's codes (the LCP pass reads them afterwards)
    rank = np.array(codes, dtype=np.int64, copy=True)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        r_ord, s_ord = rank[sa], second[sa]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = np.cumsum((r_ord[1:] != r_ord[:-1]) | (s_ord[1:] != s_ord[:-1]))
        tmp[sa] = diff
        rank, tmp = tmp, rank
        if rank[sa[-1]] == n - 1:
            return sa
        k <<= 1


def lcp_kasai(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: ``lcp[i] = LCP(suffix sa[i-1], suffix sa[i])``; O(n)."""
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def _group_pairs(
    urls: list[str], texts: list[str], min_len: int, max_block_docs: int
) -> set[tuple[str, str]]:
    """Candidate pairs within one group: concatenate the texts with
    per-boundary DISTINCT sentinels (no common substring can cross a
    boundary), build the generalized suffix array + LCP, and walk the
    maximal runs of consecutive suffixes with LCP >= min_len — every pair
    of documents sharing a >=min_len substring has both its suffixes
    inside one such run, so emitting the run's distinct-doc pairs is
    exhaustive. Runs touching more than ``max_block_docs`` documents fall
    back to star edges against the smallest url (quadratic-emit guard:
    connectivity preserved for clustering, pair exhaustiveness bounded)."""
    arrays, doc_of = [], []
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        arrays.append(np.concatenate([b, [256 + i]]))  # distinct sentinel
        doc_of.append(np.full(len(b) + 1, i, dtype=np.int64))
    codes = np.concatenate(arrays)
    doc_of = np.concatenate(doc_of)
    sa = build_suffix_array(codes)
    lcp = lcp_kasai(codes, sa)

    pairs: set[tuple[str, str]] = set()
    i = 1
    n = len(sa)
    while i < n:
        if lcp[i] < min_len:
            i += 1
            continue
        run_docs = {int(doc_of[sa[i - 1]])}
        while i < n and lcp[i] >= min_len:
            run_docs.add(int(doc_of[sa[i]]))
            i += 1
        if len(run_docs) < 2:
            continue
        members = sorted(urls[d] for d in run_docs)
        if len(members) > max_block_docs:
            pairs.update((members[0], m) for m in members[1:])
        else:
            pairs.update(
                (a, b) for ai, a in enumerate(members) for b in members[ai + 1 :]
            )
    return pairs


def suffix_array_pairs(
    docs: DataFrame,
    group_col,
    min_len: int = 64,
    max_docs_per_group: int = 4096,
    max_block_docs: int = 32,
) -> DataFrame:
    """``docs(url, text, ...)`` grouped by ``group_col`` →
    ``(url_a, url_b, lcs_len)``: every intra-group pair with a verbatim
    common substring of at least ``min_len`` chars, with the EXACT longest
    common substring length (suffix-automaton verify per emitted pair —
    the candidate walk guarantees a >=min_len lower bound; the verify
    upgrades it to the exact value).

    ``group_col`` is any Column (e.g. ``F.col("source")`` or
    ``F.parse_url("url", lit("HOST"))``); one shuffle on it, then each
    group is an independent applyInPandas task. Groups larger than
    ``max_docs_per_group`` are capped deterministically (url order)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url").head(max_docs_per_group)
        urls = pdf["url"].tolist()
        texts = ["" if t is None else str(t) for t in pdf["text"].tolist()]
        if len(urls) < 2:
            return pd.DataFrame(columns=["url_a", "url_b", "lcs_len"])
        by_url = dict(zip(urls, texts))
        rows = [
            (a, b, longest_common_substring_len(by_url[a], by_url[b]))
            for a, b in sorted(_group_pairs(urls, texts, min_len, max_block_docs))
        ]
        out = pd.DataFrame(rows, columns=["url_a", "url_b", "lcs_len"])
        return out[out["lcs_len"] >= min_len]

    return (
        docs.select("url", "text", group_col.alias("_grp"))
        .groupBy("_grp")
        .applyInPandas(per_group, schema=PAIRS_SCHEMA)
    )
