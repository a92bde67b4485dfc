"""Incremental near-dup probe: new batch vs signature store in O(delta).

Covers: exact new-vs-store dup, perturbed near-dup, within-batch
(new x new) dup, unique no-ops, the boilerplate overflow guard, and the
plan property (store side never shuffled — the batch bands broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_duplicate_finder_python_spark import DedupConfig
from video_duplicate_finder_python_spark.operators.incremental_probe import (
    probe_near_dups,
)
from video_duplicate_finder_python_spark.operators.signature_stage import (
    compute_signatures,
)

CFG = DedupConfig()


def _doc(seed_words, n=120):
    return " ".join(seed_words[i % len(seed_words)] + str(i * 7 % 13) for i in range(n))


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        (f"https://old.example/{i}", _doc([f"w{i}a", f"w{i}b", f"w{i}c", "base"]))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    return compute_signatures(df, CFG, keep_cols=["url", "text"]).persist()


def test_probe_finds_expected_pairs(spark, store):
    old0 = store.where("url = 'https://old.example/0'").collect()[0]["text"]
    old1 = store.where("url = 'https://old.example/1'").collect()[0]["text"]
    near = old1.split(" ")
    near[3], near[17] = "changedx", "changedy"  # ~1.7% token change
    batch_dup = _doc(["bdupa", "bdupb", "bdupc", "fresh"])
    rows = [
        ("https://new.example/exact", old0),
        ("https://new.example/near", " ".join(near)),
        ("https://new.example/unique", _doc(["zq1", "zq2", "zq3", "only"])),
        ("https://new.example/pair1", batch_dup),
        ("https://new.example/pair2", batch_dup),
    ]
    new_docs = spark.createDataFrame(rows, "url string, text string")
    pairs, overflow, caches = probe_near_dups(store, new_docs, CFG)
    got = {
        (r.new_url, r.other_url, r.is_new_other): r
        for r in pairs.where("is_dup").collect()
    }
    assert overflow.count() == 0

    k = ("https://new.example/exact", "https://old.example/0", False)
    assert k in got and got[k].jaccard == pytest.approx(1.0)
    k = ("https://new.example/near", "https://old.example/1", False)
    assert k in got and got[k].jaccard >= CFG.jaccard_threshold
    # within-batch dup found once, as a new-new pair
    assert ("https://new.example/pair1", "https://new.example/pair2", True) in got
    # unique doc pairs with nothing; no spurious cross pairs
    assert all(
        "unique" not in a and "unique" not in b for (a, b, _) in got
    )
    for c in caches:
        c.unpersist()


def test_overflow_guard(spark, store):
    boiler = _doc(["common", "boiler", "plate", "page"])
    old = spark.createDataFrame(
        [(f"https://old.example/b{i}", boiler) for i in range(20)],
        "url string, text string",
    )
    big_store = compute_signatures(old, CFG, keep_cols=["url", "text"])
    new_docs = spark.createDataFrame(
        [("https://new.example/boiler", boiler)], "url string, text string"
    )
    pairs, overflow, caches = probe_near_dups(big_store, new_docs, CFG, max_matches_per_doc=5)
    ov = overflow.collect()
    assert len(ov) == 1 and ov[0].new_url == "https://new.example/boiler"
    assert ov[0].n_matches == 20
    assert pairs.where("not is_new_other").count() == 0  # diverted, not exploded
    for c in caches:
        c.unpersist()


def test_store_side_not_shuffled(spark, store):
    new_docs = spark.createDataFrame(
        [("https://new.example/x", _doc(["p", "q", "r", "s"]))],
        "url string, text string",
    )
    pairs, _, caches = probe_near_dups(store, new_docs, CFG)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the store->candidates join must be broadcast (batch side built), not
    # a sort-merge/shuffled-hash join over the store
    assert "BroadcastHashJoin" in plan
    for c in caches:
        c.unpersist()


def test_probe_batch_job(spark, store, tmp_path):
    """jobs/probe_batch.py end-to-end in a subprocess (the job owns its
    session): store parquet + new pages parquet -> verified pairs."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    store_dir = str(tmp_path / "store")
    store.write.mode("overwrite").parquet(store_dir)

    old0 = store.where("url = 'https://old.example/0'").collect()[0]["text"]
    pages = spark.createDataFrame(
        [
            ("https://new.example/exact", None,
             f"<html><head><title>t</title></head><body><p>{old0}</p></body></html>".encode(),
             None, "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    inp = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "pairs")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo)
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[4] --conf spark.sql.shuffle.partitions=8 pyspark-shell"
    )
    proc = subprocess.run(
        [sys.executable, str(repo / "jobs" / "probe_batch.py"),
         "--store", store_dir, "--input", inp, "--output", out],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("VDF_PROBE_SUMMARY ")
    )
    summary = json.loads(line.split(" ", 1)[1])
    assert summary["pairs"] == 1
    rows = spark.read.parquet(out).collect()
    assert rows[0].new_url == "https://new.example/exact"
    assert rows[0].other_url == "https://old.example/0"
    assert rows[0].jaccard == 1.0


def test_substring_source_catches_low_jaccard_span(spark, store):
    """A new doc sharing a >=500-char verbatim span with a store doc at
    Jaccard ~0.33 is invisible to the band probe but caught by the
    CDC-fingerprint source + anchored-span verification (the pipeline's
    'suffix' class, now incremental)."""
    span = " ".join(f"sp{j}x{j % 9}" for j in range(150))       # ~900 chars
    tail_a = " ".join(f"oa{j}h{j % 7}" for j in range(300))
    tail_b = " ".join(f"nb{j}k{j % 7}" for j in range(300))
    old = spark.createDataFrame(
        [("https://old.example/span", span + " " + tail_a)], "url string, text string"
    )
    span_store = compute_signatures(old, CFG, keep_cols=["url", "text"])
    new_docs = spark.createDataFrame(
        [("https://new.example/span", span + " " + tail_b)], "url string, text string"
    )
    pairs, overflow, caches = probe_near_dups(span_store, new_docs, CFG)
    got = pairs.collect()
    assert overflow.count() == 0
    for c in caches:
        c.unpersist()
    assert len(got) == 1
    r = got[0]
    assert r.other_url == "https://old.example/span"
    assert r.jaccard < CFG.jaccard_threshold          # bands alone miss it
    assert r.lcs_len >= CFG.substring_min_len
    assert r.is_dup

    # substring=False prunes the source: no pair at all
    pairs2, _, caches2 = probe_near_dups(
        span_store.drop("fingerprints"), new_docs, CFG, substring=False
    )
    assert pairs2.count() == 0
    for c in caches2:
        c.unpersist()

    # substring=True on a store without fingerprints is a loud error
    with pytest.raises(ValueError):
        probe_near_dups(span_store.drop("fingerprints"), new_docs, CFG)


def test_recrawl_batch_url_shadows_store_row(spark, store):
    """A url in BOTH batch and store (streaming re-crawl: probe runs
    before the upsert) must not create ambiguous/conflicting pairs: the
    batch's text is authoritative for its own url, the store row it
    shadows is excluded from candidates and profiles. A second batch doc
    duplicating that url pairs against the BATCH text exactly once."""
    recrawl_text = _doc(["rc1", "rc2", "rc3", "fresh"])
    new_docs = spark.createDataFrame(
        [
            # re-crawl of an existing store url with drifted content
            ("https://old.example/0", recrawl_text),
            # another batch doc duplicating the re-crawled content
            ("https://new.example/twin", recrawl_text),
        ],
        "url string, text string",
    )
    pairs, overflow, caches = probe_near_dups(store, new_docs, CFG)
    got = pairs.collect()
    assert overflow.count() == 0
    for c in caches:
        c.unpersist()
    # exactly ONE pair row: the within-batch twin against the batch text;
    # no pair against the shadowed store version of old.example/0, and no
    # duplicated/conflicting rows for the same pair
    assert len(got) == 1
    r = got[0]
    assert {r.new_url, r.other_url} == {
        "https://old.example/0",
        "https://new.example/twin",
    }
    assert r.is_new_other and r.is_dup and r.jaccard == 1.0
