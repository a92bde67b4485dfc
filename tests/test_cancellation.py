"""Cooperative cancellation (SURVEY O19) — cancel aborts the run, completed
stage checkpoints survive, and a rerun resumes from them (the reference's
stop flag + cache semantics, scanner.py:145-147 + database.py:93-130)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from video_duplicate_finder_python_spark import (
    DedupConfig,
    DedupPipeline,
    PipelineCancelled,
)
from video_duplicate_finder_python_spark.corpus import generate_corpus, pages_spark_df


def test_cancel_aborts_and_rerun_resumes(spark, tmp_path):
    corpus = generate_corpus(seed=7, n_docs=80)
    pages = pages_spark_df(spark, corpus)
    ckpt_dir = str(tmp_path / "ckpt")

    seen: list[str] = []
    pipe = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckpt_dir,
                         on_stage_start=seen.append)

    def cancelling_progress(stage: str) -> None:
        seen.append(stage)
        if stage == "signatures":
            # the reference flips _stop_requested from the UI thread; here
            # the progress callback is the deterministic injection point
            pipe.cancel()

    pipe.on_stage_start = cancelling_progress
    with pytest.raises(PipelineCancelled):
        pipe.run(pages)

    # stages before the cancel point completed and persisted; later ones not
    done = {p.parent.name for p in Path(ckpt_dir).glob("*/_metrics.json")}
    assert {"docs", "rep_docs", "exact_edges", "signatures"} <= done
    assert "candidates" not in done and "clusters" not in done
    assert seen == ["docs", "rep_docs", "exact_edges", "signatures"]

    # rerun with a fresh pipeline: completed stages load from checkpoint
    pipe2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=ckpt_dir)
    res = pipe2.run(pages)
    m = res.metrics
    for stage in ["docs", "rep_docs", "exact_edges", "signatures"]:
        assert m[stage]["cached"], stage
    for stage in ["candidates", "pairs", "clusters"]:
        assert not m[stage]["cached"], stage
    assert res.clusters.count() > 0

    # checkpoint metrics on disk confirm the signatures stage ran exactly once
    meta = json.loads((Path(ckpt_dir) / "signatures" / "_metrics.json").read_text())
    assert meta["cached"] is False  # written by the first (cancelled) run


def test_cancel_flag_cleared_on_new_run(spark, tmp_path):
    corpus = generate_corpus(seed=7, n_docs=30)
    pages = pages_spark_df(spark, corpus)
    pipe = DedupPipeline(spark, DedupConfig())
    pipe.cancel()
    # run() resets the flag (the reference re-arms on each scan start)
    res = pipe.run(pages)
    assert res.clusters.count() >= 0
