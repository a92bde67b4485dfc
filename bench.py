"""Driver bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf", ...}.

Timing forces FULL execution of every projected column via a noop-format
write: the round-1 harness timed ``.count()``, and Catalyst prunes
deterministic projections under count(1) — so the md5/shingle/MinHash/CDC
queries were benchmarked as bare parquet row-counts (round-1 advice item).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_core import make_session, run_dedup_pipeline  # noqa: E402


def force(df) -> None:
    """Execute the full plan incl. every projected column (no sink IO)."""
    df.write.format("noop").mode("overwrite").save()


def best_of(make_df, repeats: int = 3) -> float:
    """Min wall over `repeats` executions of a freshly-built plan. The
    sandbox host carries fluctuating neighbor load (up to 3× run-to-run;
    five round-2 single-shot lines were 3-8× inflated by it), so a single
    sample measures the neighbors, not the query — min-of-N approximates
    uncontended cost, same policy as scripts/scaling_bench.py."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        force(make_df())
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from video_duplicate_finder_python_spark.operators.ann import (
        ann_probe,
        build_ann_index,
    )
    from video_duplicate_finder_python_spark.sources.pages import documents_as_pages

    spark = make_session(cpus)
    queries: dict[str, float] = {}
    t_total0 = time.monotonic()

    # headline: the end-to-end dedup pipeline (the engine's reason to
    # exist) — best-of-3, the same sampling every other line gets via
    # best_of(): the first run of a fresh JVM pays one-time JIT + heap
    # first-touch (measured 20-25s vs 13-14s warm at sf0.1/local[32]),
    # which on a long-lived cluster is setup, not per-job cost, and this
    # host's neighbor load inflates single samples up to 3×
    pages = documents_as_pages(spark, sf_dir)
    dedup = min(
        (run_dedup_pipeline(spark, pages) for _ in range(3)),
        key=lambda s: s["wall_s"],
    )
    queries["dedup_pipeline"] = dedup["wall_s"]

    # representative operator queries (SQL-expressible subset that scales)
    bench_names = [
        "doc_content_hash",
        "token_counts",
        "stopword_ratio",
        "minhash_signatures",
        "cdc_fingerprints",
        "pricing_summary",
        "top_customer_spend",
        "order_priority_count",
        "events_daily",
        "latest_event_per_user",
        "customers_without_orders",
        "knn_dot_q0",
        "knn_dot_q0_udf",
        "knn_cosine_q0",
        # round-5 extras (adds ~6 lines to the total — see
        # BENCH/BASELINE.md round-over-round note)
        "repetition_scores",
        "tfidf_top_terms",
        "weighted_jaccard_pairs",
        "line_dedup_cleaned",
        "contaminated_docs",
        "url_dedup",
        "pii_scrubbed",
        "gopher_filter",
        # the north rule's generalized suffix-array substring pass
        "suffix_array_pair_spans",
    ]
    all_queries = entrymod.queries()
    for name in bench_names:
        queries[name] = best_of(lambda: all_queries[name](spark, sf_dir))

    # perceptual-hash media dedup (round 6): the reference's core video
    # algorithm — frame-sample → per-frame pHash/dHash → pigeonhole LSH →
    # reference-scored pairs (operators/media_dedup.py). Not one of the 50
    # driver-recorded queries (hard cap, __spark_entry__.queries docstring);
    # evidence is this line + the brute-force-oracle pytest twin
    # (tests/test_media_phash.py).
    from video_duplicate_finder_python_spark.operators.media_dedup import (
        media_dup_pairs,
        media_frame_hashes,
    )

    def media_run() -> float:
        frames = media_frame_hashes(documents_as_pages(spark, sf_dir))
        t0 = time.monotonic()
        pairs, _, cached = media_dup_pairs(frames, persist=True)
        force(pairs)
        wall = time.monotonic() - t0
        for c in cached:
            c.unpersist()
        return wall

    queries["media_phash_pairs"] = round(min(media_run() for _ in range(3)), 3)

    # incremental near-dup probe (round 6, operators/incremental_probe.py):
    # 250-doc batch (125 byte-copies + 125 fresh) against a signature
    # store built from the full sf corpus — the O(delta) "is this batch
    # new?" path, both candidate sources (bands + CDC fingerprints)
    from pyspark.sql import functions as F

    from video_duplicate_finder_python_spark.functions.text import (
        extract_text_col as _extract,
    )
    from video_duplicate_finder_python_spark.operators.incremental_probe import (
        probe_near_dups,
    )
    from video_duplicate_finder_python_spark.operators.signature_stage import (
        compute_signatures as _sigs,
    )
    from video_duplicate_finder_python_spark import DedupConfig as _Cfg

    _cfg = _Cfg()
    _docs = documents_as_pages(spark, sf_dir).select(
        "url", _extract(F.col("html")).alias("text")
    )
    with tempfile.TemporaryDirectory() as _tmp:
        _store_path = f"{_tmp}/probe_store"
        _sigs(_docs, _cfg, keep_cols=["url", "text"]).write.parquet(_store_path)
        _store = spark.read.parquet(_store_path)
        _copies = _docs.orderBy(F.xxhash64("url")).limit(125).select(
            F.concat(F.lit("copy:"), "url").alias("url"), "text"
        )
        _fresh = spark.range(125).select(
            F.concat(F.lit("fresh:"), F.col("id").cast("string")).alias("url"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(120)),
                    lambda i: F.concat(
                        F.lit("pf"), F.col("id").cast("string"), F.lit("w"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        _batch_path = f"{_tmp}/probe_batch"
        _copies.unionByName(_fresh).write.parquet(_batch_path)
        _batch = spark.read.parquet(_batch_path)

        def probe_run() -> float:
            t0 = time.monotonic()
            pairs, overflow, cached = probe_near_dups(_store, _batch, _cfg)
            force(pairs.where("is_dup"))
            wall = time.monotonic() - t0
            for c in cached:
                c.unpersist()
            return wall

        queries["probe_batch250"] = round(min(probe_run() for _ in range(3)), 3)

    # SemDeDup semantic dedup (round 6, operators/semdedup.py): k-means
    # cells → within-cell cosine pairs → CC groups → keep-the-outlier.
    # eps=0.6 here because the synthetic embeddings carry no true
    # semantic dups (max within-cell cosine ≈ 0.6 at sf0.1) — the looser
    # knob makes the verify/CC/keeper stages do real work (315 members /
    # 140 groups at sf0.1); semantics at the paper's eps are pytest-
    # twinned on planted duplicates (tests/test_semdedup.py).
    from video_duplicate_finder_python_spark.operators.ann import (
        train_ivf_centroids,
    )
    from video_duplicate_finder_python_spark.operators.semdedup import semdedup

    emb_docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem_cents = train_ivf_centroids(emb_docs)
    queries["semdedup_members"] = best_of(
        lambda: semdedup(emb_docs, sem_cents, eps=0.6)[0]
    )

    # ANN scale paths: ONE index build (corpus UDF pass) amortized over a
    # probe-join query batch — probe must cost a small fraction of build
    from video_duplicate_finder_python_spark.operators.ann import (
        build_ivf_index,
        ivf_probe,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        idx_path = f"{tmp}/ann_index"
        t0 = time.monotonic()
        build_ann_index(emb).write.mode("overwrite").parquet(idx_path)
        queries["ann_build_index"] = round(time.monotonic() - t0, 3)
        index = spark.read.parquet(idx_path)
        queries["ann_probe_batch8"] = best_of(
            lambda: ann_probe(index, emb, query_ids=list(range(8)), k=10)
        )

        ivf_path = f"{tmp}/ivf_index"
        t0 = time.monotonic()
        cents = train_ivf_centroids(emb)
        build_ivf_index(emb, cents).write.mode("overwrite").parquet(ivf_path)
        queries["ivf_build_index"] = round(time.monotonic() - t0, 3)
        ivf_index = spark.read.parquet(ivf_path)
        queries["ivf_probe_batch8"] = best_of(
            lambda: ivf_probe(ivf_index, emb, cents, query_ids=list(range(8)), k=10)
        )

        # recall@10 artifact (round-3 verdict #6 / round-4 #4): the ANN
        # structures' quality vs the exact cosine top-10, averaged over
        # the same 8-query batch the probe lines time — so BENCH_r{N}.json
        # carries speed AND accuracy for the approximate paths
        from video_duplicate_finder_python_spark.operators.ann import (
            brute_force_topk,
        )

        qids = list(range(8))
        truth = {
            q: {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
            for q in qids
        }

        def recall_at_10(probe_df) -> float:
            approx: dict[int, set] = {}
            for r in probe_df.collect():
                approx.setdefault(r["query_id"], set()).add(r["vec_id"])
            return round(
                sum(len(truth[q] & approx.get(q, set())) / 10 for q in qids)
                / len(qids),
                3,
            )

        recalls = {
            "ann_lsh_recall_at_10": recall_at_10(
                ann_probe(index, emb, query_ids=qids, k=10)
            ),
            # at the DEFAULT config (n_probe=32 since round 6) plus the
            # cheaper dial-down point, so the artifact shows the tradeoff
            "ann_ivf_recall_at_10": recall_at_10(
                ivf_probe(ivf_index, emb, cents, query_ids=qids, k=10)
            ),
            "ann_ivf_recall_at_10_nprobe16": recall_at_10(
                ivf_probe(ivf_index, emb, cents, query_ids=qids, k=10, n_probe=16)
            ),
        }

    # WARC ingest throughput (driver-side parser kernel: the per-task cost
    # of sources/warc.py's streaming decompress + rolling-buffer framing;
    # the Spark job around it is one map task per file, so per-file parser
    # MB/s IS the scale number for crawl-container ingestion)
    import datetime as dt

    from video_duplicate_finder_python_spark.sources.warc import (
        build_warc_bytes,
        iter_warc_records,
    )

    warc_recs = [
        {
            "url": f"https://bench.example/{i}",
            "warc_ts": dt.datetime(2025, 1, 1),
            "html": (f"<html>{'lorem ipsum dolor ' * 12000}doc{i}</html>").encode(),
        }
        for i in range(300)
    ]
    warc_gz = build_warc_bytes(warc_recs, gzip_members=True)
    decompressed_mb = sum(len(r["html"]) for r in warc_recs) / 2**20
    warc_best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        n_parsed = sum(1 for _ in iter_warc_records(warc_gz))
        warc_best = min(warc_best, time.monotonic() - t0)
    assert n_parsed == len(warc_recs)

    total = time.monotonic() - t_total0
    out = {
        "metric": "bench_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "dedup_docs_per_sec": dedup["docs_per_sec"],
        "dedup_n_docs": dedup["n_docs"],
        "warc_parse_mb_per_sec": round(decompressed_mb / warc_best, 1),
        **recalls,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
