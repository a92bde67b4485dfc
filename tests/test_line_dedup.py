"""Planted-corpus oracles for corpus-level exact line dedup
(operators/line_dedup.py) and benchmark decontamination
(operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

BOILER = " ".join(f"nav{i}" for i in range(10))  # exactly one 10-token chunk
UNIQ = lambda d, n: " ".join(f"u{d}w{i}" for i in range(n))  # noqa: E731

LINE_DOCS = [
    # boilerplate chunk planted at chunk position 0 of docs 0 and 1
    (0, BOILER + " " + UNIQ(0, 10)),
    (1, BOILER + " " + UNIQ(1, 25)),  # ragged tail chunk (5 tokens)
    (2, UNIQ(2, 12)),  # no shared chunks
    # doc 3 repeats ITS OWN unique chunk twice: within-doc repeat of a
    # doc-unique line survives (RefinedWeb semantics: cross-doc only)
    (3, UNIQ(3, 10) + " " + UNIQ(3, 10)),
    (4, BOILER),  # only the shared chunk → cleaned_text must be ""
]


def test_line_dedup_drops_cross_doc_chunks_only(spark):
    from video_duplicate_finder_python_spark.operators.line_dedup import (
        drop_cross_doc_duplicate_lines,
    )

    d = spark.createDataFrame(LINE_DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (r.cleaned_text, r.n_dropped)
        for r in drop_cross_doc_duplicate_lines(d).collect()
    }
    assert got[0] == (UNIQ(0, 10), 1)
    # doc 1: boiler dropped, its three chunks of UNIQ(1,25) survive intact
    assert got[1] == (UNIQ(1, 25), 1)
    assert got[2] == (UNIQ(2, 12), 0)
    assert got[3] == (UNIQ(3, 10) + " " + UNIQ(3, 10), 0)
    assert got[4] == ("", 1)


def test_line_dedup_roundtrip_when_no_duplicates(spark):
    from video_duplicate_finder_python_spark.operators.line_dedup import (
        drop_cross_doc_duplicate_lines,
    )

    docs = [(i, UNIQ(i, 7 + 3 * i)) for i in range(6)]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r.cleaned_text for r in drop_cross_doc_duplicate_lines(d).collect()}
    # chunking + reassembly must be lossless on a duplicate-free corpus
    assert got == dict(docs)


def test_contamination_overlap_counts_shared_shingles(spark):
    from video_duplicate_finder_python_spark.operators.decontaminate import (
        contamination_overlap,
    )

    def shingled(rows):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        toks = F.split("text", " ")
        n = F.size(toks)
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 4),
                lambda i: F.array_join(F.slice(toks, i, 5), " "),
            )
        )
        return df.select("doc_id", F.when(n >= 5, sh).otherwise(F.array(F.array_join(toks, " "))).alias("s"))

    eval_rows = [(100, "alpha beta gamma delta epsilon zeta")]  # 2 shingles
    corpus_rows = [
        (0, "alpha beta gamma delta epsilon eta"),  # shares 1 shingle
        (1, "beta gamma delta epsilon zeta theta iota"),  # shares 1
        (2, "alpha beta gamma delta epsilon zeta kappa"),  # shares both
        (3, "totally different words here now five"),  # shares none
    ]
    got = {
        r.doc_id: r.n_shared
        for r in contamination_overlap(shingled(corpus_rows), shingled(eval_rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2}
