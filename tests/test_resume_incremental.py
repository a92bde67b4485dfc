"""Resumability (stage checkpoints) + incremental anti-join refresh (O3)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline
from video_duplicate_finder_python_spark.corpus import generate_corpus, pages_spark_df
from video_duplicate_finder_python_spark.operators.incremental import (
    incremental_signatures,
)


@pytest.fixture()
def ckdir(tmp_path):
    d = tmp_path / "ck"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_rerun_resumes_every_stage_from_checkpoint(spark, ckdir):
    corpus = generate_corpus(seed=5, n_docs=80)
    pages = pages_spark_df(spark, corpus)

    res1 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages)
    clusters1 = sorted(map(tuple, res1.clusters.collect()))
    assert not any(m["cached"] for m in res1.metrics.values())

    res2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages)
    clusters2 = sorted(map(tuple, res2.clusters.collect()))
    assert all(m["cached"] for m in res2.metrics.values()), res2.metrics
    assert clusters1 == clusters2


def test_changed_input_invalidates(spark, ckdir):
    corpus = generate_corpus(seed=5, n_docs=60)
    pages = pages_spark_df(spark, corpus)
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages)

    corpus2 = generate_corpus(seed=5, n_docs=61)
    pages2 = pages_spark_df(spark, corpus2)
    res = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages2)
    assert not res.metrics["docs"]["cached"]


def test_content_rewrite_at_fixed_url_ts_invalidates(spark, ckdir):
    """Round-2 verdict item #8: a byte-rewrite that keeps (url, warc_ts)
    fixed — the residual staleness hole the old two-column digest had —
    must invalidate the stage fingerprints via the length(html) signal."""
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages1 = spark.createDataFrame(
        [("https://x/1", None, b"<html><body><p>original body text</p></body></html>", None, "en")],
        schema,
    )
    res1 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages1)
    assert not res1.metrics["docs"]["cached"]

    pages2 = spark.createDataFrame(
        [("https://x/1", None, b"<html><body><p>rewritten and longer body text</p></body></html>", None, "en")],
        schema,
    )
    res2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages2)
    assert not res2.metrics["docs"]["cached"], (
        "same (url, warc_ts), different bytes → stages must recompute"
    )


def test_changed_config_invalidates(spark, ckdir):
    corpus = generate_corpus(seed=5, n_docs=60)
    pages = pages_spark_df(spark, corpus)
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckdir).run(pages)
    res = DedupPipeline(
        spark, DedupConfig(jaccard_threshold=0.7), checkpoint_dir=ckdir
    ).run(pages)
    assert not res.metrics["docs"]["cached"]


def test_incremental_signatures_computes_only_delta(spark):
    old = spark.createDataFrame(
        [("u1", 11, "sig1"), ("u2", 22, "sig2"), ("u3", 33, "sig3")],
        ["url", "content_hash", "payload"],
    )
    # u1 unchanged; u2 content changed; u3 vanished; u4 new
    docs = spark.createDataFrame(
        [("u1", 11), ("u2", 99), ("u4", 44)], ["url", "content_hash"]
    )
    computed = []

    def compute(delta):
        computed.extend(sorted(r["url"] for r in delta.collect()))
        return delta.withColumn("payload", F.lit("fresh"))

    sigs, delta = incremental_signatures(docs, old, compute)
    rows = {r["url"]: r["payload"] for r in sigs.collect()}
    assert computed == ["u2", "u4"]          # only changed + new pay for compute
    assert rows == {"u1": "sig1", "u2": "fresh", "u4": "fresh"}  # u3 GC'd
