"""Suffix-automaton LCS + CDC fingerprint position-independence."""

from __future__ import annotations

import numpy as np

from video_duplicate_finder_python_spark.functions.fingerprint import cdc_fingerprints
from video_duplicate_finder_python_spark.functions.lcs import (
    longest_common_substring_len,
)


def test_lcs_basic():
    assert longest_common_substring_len("abcdef", "zabcq") == 3  # "abc"
    assert longest_common_substring_len("same", "same") == 4
    assert longest_common_substring_len("abc", "xyz") == 0
    assert longest_common_substring_len("", "abc") == 0
    assert longest_common_substring_len("ababab", "babab") == 5


def test_lcs_brute_force_agreement():
    rng = np.random.default_rng(3)
    alpha = "abcd"
    for _ in range(30):
        a = "".join(rng.choice(list(alpha), size=rng.integers(1, 30)))
        b = "".join(rng.choice(list(alpha), size=rng.integers(1, 30)))
        brute = 0
        for i in range(len(a)):
            for j in range(i + 1, len(a) + 1):
                if a[i:j] in b:
                    brute = max(brute, j - i)
        assert longest_common_substring_len(a, b) == brute, (a, b)


def _rand_text(rng, n):
    return " ".join(f"w{int(x)}" for x in rng.integers(0, 5000, size=n))


def test_cdc_shared_span_shares_fingerprint_regardless_of_position():
    """A >=500-char verbatim span embedded at different offsets in two
    otherwise-unrelated docs must produce >=1 common chunk fingerprint —
    the recall property the substring pass depends on."""
    rng = np.random.default_rng(7)
    span = _rand_text(rng, 120)  # ~600+ chars
    assert len(span) >= 500
    doc_a = _rand_text(rng, 200) + " " + span + " " + _rand_text(rng, 50)
    doc_b = _rand_text(rng, 17) + " " + span + " " + _rand_text(rng, 300)
    fa = set(cdc_fingerprints(doc_a))
    fb = set(cdc_fingerprints(doc_b))
    assert fa & fb, "no shared CDC fingerprint for a shared 500-char span"


def test_cdc_unrelated_docs_share_nothing():
    rng = np.random.default_rng(8)
    fa = set(cdc_fingerprints(_rand_text(rng, 400)))
    fb = set(cdc_fingerprints(_rand_text(rng, 400)))
    assert not (fa & fb)


def test_anchored_span_matches_true_lcs_on_planted_spans():
    from video_duplicate_finder_python_spark.functions.fingerprint import (
        anchored_common_span_len,
    )

    rng = np.random.default_rng(17)
    for trial in range(10):
        span = _rand_text(rng, int(rng.integers(90, 250)))
        doc_a = _rand_text(rng, 150) + " " + span + " " + _rand_text(rng, 80)
        doc_b = _rand_text(rng, 40) + " " + span + " " + _rand_text(rng, 200)
        true_lcs = longest_common_substring_len(doc_a, doc_b)
        got = anchored_common_span_len(doc_a, doc_b)
        # anchored extension recovers the full planted span (±nothing): it
        # must find at least the span itself, never exceed the true LCS
        assert got <= true_lcs
        assert got >= len(span), (trial, got, len(span), true_lcs)


def test_anchored_span_zero_for_unrelated_docs():
    from video_duplicate_finder_python_spark.functions.fingerprint import (
        anchored_common_span_len,
    )

    rng = np.random.default_rng(18)
    assert anchored_common_span_len(_rand_text(rng, 300), _rand_text(rng, 300)) == 0
    assert anchored_common_span_len("", "abc") == 0


def test_cdc_deterministic_and_short_doc_empty():
    rng = np.random.default_rng(9)
    t = _rand_text(rng, 300)
    assert cdc_fingerprints(t) == cdc_fingerprints(t)
    assert cdc_fingerprints("tiny") == []
    assert cdc_fingerprints(None) == []


def test_cdc_spark_udf_parity_sf001(spark):
    """Driver-row compensation (VERDICT r1 #9): q_cdc_fingerprints has no
    SQL oracle, so assert the Spark UDF's per-doc fingerprint counts equal
    the pure-Python cdc_fingerprints over the real sf0.01 documents table
    (validates the Arrow string round-trip + null handling end-to-end)."""
    from video_duplicate_finder_python_spark.config import DedupConfig
    from video_duplicate_finder_python_spark.functions.fingerprint import (
        cdc_fingerprints_udf,
    )
    from pyspark.sql import functions as F

    cfg = DedupConfig()
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    udf = cdc_fingerprints_udf(cfg.cdc_window, cfg.cdc_mask_bits, cfg.cdc_min_chunk)
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(udf("text")).alias("n")).collect()
    }
    rows = docs.select("doc_id", "text").toPandas()
    for doc_id, text in zip(rows["doc_id"], rows["text"]):
        want = len(
            cdc_fingerprints(text, cfg.cdc_window, cfg.cdc_mask_bits, cfg.cdc_min_chunk)
        )
        assert got[doc_id] == want, doc_id


def test_rolling_hashes_match_one_pass_per_byte_formulation():
    """The binary-doubling ladder (round 6) must reproduce the textbook
    one-multiply-add-per-window-byte rolling hash bit-for-bit, across
    window shapes (powers of two, odd, window == n)."""
    import numpy as np

    from video_duplicate_finder_python_spark.functions.fingerprint import (
        _BASE,
        _rolling_hashes,
    )

    rng = np.random.default_rng(11)
    for n, window in [(48, 48), (49, 48), (777, 48), (8128, 48),
                      (64, 64), (100, 7), (50, 5), (1000, 1), (63, 63)]:
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        got = _rolling_hashes(data, window)
        d64 = data.astype(np.uint64)
        ref = np.zeros(n - window + 1, dtype=np.uint64)
        pw = np.uint64(1)
        with np.errstate(over="ignore"):
            for j in range(window - 1, -1, -1):
                ref += d64[j : j + n - window + 1] * pw
                pw = pw * _BASE
        assert got.shape == ref.shape
        assert (got == ref).all(), (n, window)
