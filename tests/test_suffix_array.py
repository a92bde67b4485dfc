"""Generalized suffix-array substring pass (operators/suffix_array.py):
construction primitives against naive references, and the grouped operator
against a brute-force exact-LCS oracle (exhaustive within-group recall)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.functions.lcs import (
    longest_common_substring_len,
)
from video_duplicate_finder_python_spark.operators.suffix_array import (
    build_suffix_array,
    lcp_kasai,
    suffix_array_pairs,
)


def _naive_sa(s: bytes) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def _naive_lcp(s: bytes, sa: list[int]) -> list[int]:
    out = [0] * len(sa)
    for i in range(1, len(sa)):
        a, b = s[sa[i - 1] :], s[sa[i] :]
        k = 0
        while k < len(a) and k < len(b) and a[k] == b[k]:
            k += 1
        out[i] = k
    return out


def test_suffix_array_and_lcp_match_naive():
    rng = random.Random(7)
    for n, alpha in [(1, 2), (13, 3), (200, 4), (500, 26), (300, 2)]:
        s = bytes(rng.randrange(97, 97 + alpha) for _ in range(n))
        codes = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
        sa = build_suffix_array(codes)
        assert sa.tolist() == _naive_sa(s)
        assert lcp_kasai(codes, sa).tolist() == _naive_lcp(s, sa.tolist())


def _brute_pairs(docs: list[tuple[str, str, int]], min_len: int):
    """All intra-group pairs with exact LCS >= min_len."""
    out = {}
    for i, (ua, ta, ga) in enumerate(docs):
        for ub, tb, gb in docs[i + 1 :]:
            if ga != gb:
                continue
            n = longest_common_substring_len(ta, tb)
            if n >= min_len:
                a, b = sorted((ua, ub))
                out[(a, b)] = n
    return out


def test_grouped_pairs_match_brute_force(spark):
    rng = random.Random(11)
    words = [f"tok{i}" for i in range(60)]
    span1 = " ".join(rng.choice(words) for _ in range(25))
    span2 = "x".join(str(rng.randrange(10)) for _ in range(80))

    def noise(n):
        return " ".join(rng.choice(words) for _ in range(n))

    docs = [
        # group 0: d0/d1 share span1; d2 shares span2 with d3; d4 unrelated
        ("u00", f"{noise(20)} {span1} {noise(15)}", 0),
        ("u01", f"{span1} {noise(30)}", 0),
        ("u02", f"{noise(10)} {span2}", 0),
        ("u03", f"{span2} {noise(12)}", 0),
        ("u04", noise(40), 0),
        # group 1: same span1 text but different group -> must NOT pair
        # with group 0's holders; pairs only within group 1
        ("u10", f"{span1} {noise(5)}", 1),
        ("u11", f"{noise(8)} {span1}", 1),
        # group 2: singleton
        ("u20", f"{span1} {span2}", 2),
        # empty / null-ish text
        ("u12", "", 1),
    ]
    expected = _brute_pairs(docs, min_len=40)
    assert expected  # the fixture must actually plant pairs

    df = spark.createDataFrame(docs, ["url", "text", "grp"])
    got = {
        (r["url_a"], r["url_b"]): r["lcs_len"]
        for r in suffix_array_pairs(df, F.col("grp"), min_len=40).collect()
    }
    assert got == expected


def test_block_cap_falls_back_to_star_edges(spark):
    shared = "z y " * 40  # >=min_len shared span across ALL docs
    docs = [(f"u{i:02d}", f"{shared} tail{i}", 0) for i in range(12)]
    df = spark.createDataFrame(docs, ["url", "text", "grp"])
    got = suffix_array_pairs(
        df, F.col("grp"), min_len=40, max_block_docs=4
    ).collect()
    pairs = {(r["url_a"], r["url_b"]) for r in got}
    # star fallback: every doc still connects to the min url (clustering
    # connectivity preserved), no quadratic emission
    assert {("u00", f"u{i:02d}") for i in range(1, 12)} <= pairs
    assert len(pairs) < 12 * 11 // 2


def test_group_cap_is_deterministic(spark):
    shared = "q w " * 40
    docs = [(f"u{i:02d}", f"{shared} t{i}", 0) for i in range(10)]
    df = spark.createDataFrame(docs, ["url", "text", "grp"])
    got = suffix_array_pairs(
        df.repartition(4), F.col("grp"), min_len=40, max_docs_per_group=3
    ).collect()
    urls = {u for r in got for u in (r["url_a"], r["url_b"])}
    # cap keeps the first max_docs_per_group urls in url order
    assert urls == {"u00", "u01", "u02"}
