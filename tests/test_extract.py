"""Byte-identical extraction invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.corpus import generate_corpus, pages_spark_df
from video_duplicate_finder_python_spark.functions.text import (
    extract_text_bytes,
    extract_text_col,
    extract_text_udf,
)

CASES = [
    (b"<html><head><title>t</title></head><body><p>hello world</p></body></html>", "hello world"),
    (b"<body>a<script>var x=1;</script>b</body>", "ab"),
    (b"<body>a<style>.c{}</style>b</body>", "ab"),
    (b"no tags at all", "no tags at all"),
    (b"<div>nested <b>bold</b></div>", "nested bold"),
    (b"<BODY class=x>upper</BODY>", "upper"),
    (b"", ""),
]


def test_pure_function_cases():
    for html, want in CASES:
        assert extract_text_bytes(html) == want, html


def test_pure_function_none():
    assert extract_text_bytes(None) is None


def test_udf_matches_pure_function(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], ["html"])
    got = [r["t"] for r in df.select(extract_text_udf("html").alias("t")).collect()]
    want = [extract_text_bytes(h) for h, _ in CASES]
    assert got == want


def test_jvm_column_matches_pure_function(spark):
    """The codegen hot path (extract_text_col) must agree byte-for-byte
    with the pure function on every edge case, including NULL html."""
    df = spark.createDataFrame([(h,) for h, _ in CASES] + [(None,)], ["html"])
    got = [r["t"] for r in df.select(extract_text_col(F.col("html")).alias("t")).collect()]
    want = [extract_text_bytes(h) for h, _ in CASES] + [None]
    assert got == want


def test_corpus_roundtrip_byte_identical(spark):
    """extract_text(html) must equal the pages table's text column, per
    url — for BOTH the pandas-UDF path and the JVM Column path."""
    corpus = generate_corpus(seed=11, n_docs=60)
    pages = pages_spark_df(spark, corpus)
    bad = (
        pages.withColumn("u", extract_text_udf("html"))
        .withColumn("j", extract_text_col(F.col("html")))
        .where((F.col("u") != F.col("text")) | (F.col("j") != F.col("text")))
        .count()
    )
    assert bad == 0
    # and the pure function agrees row by row (driver-side)
    for r in corpus.pages.itertuples(index=False):
        assert extract_text_bytes(r.html) == r.text
