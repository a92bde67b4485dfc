"""Dump .explain('formatted') for the round-7 optimization targets into
plans/r07/<name>_<tag>.txt (tag = before|after).

Covers every bench-line query plus the bench-only operator plans
(probe_batch250, media_phash_pairs, semdedup_members) built exactly the
way bench.py builds them.

Usage: python scripts/dump_plans_r07.py before|after [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = REPO / "plans" / "r07"


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from bench_core import make_session
    from video_duplicate_finder_python_spark import DedupConfig as _Cfg
    from video_duplicate_finder_python_spark.functions.text import extract_text_col
    from video_duplicate_finder_python_spark.operators.incremental_probe import (
        probe_near_dups,
    )
    from video_duplicate_finder_python_spark.operators.media_dedup import (
        media_dup_pairs,
        media_frame_hashes,
    )
    from video_duplicate_finder_python_spark.operators.ann import train_ivf_centroids
    from video_duplicate_finder_python_spark.operators.semdedup import semdedup
    from video_duplicate_finder_python_spark.operators.signature_stage import (
        compute_signatures,
    )
    from video_duplicate_finder_python_spark.sources.pages import documents_as_pages

    spark = make_session(8)

    names = [
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
        "repetition_scores",
        "tfidf_top_terms",
        "weighted_jaccard_pairs",
        "line_dedup_cleaned",
        "contaminated_docs",
        "url_dedup",
        "pii_scrubbed",
        "gopher_filter",
        "suffix_array_pair_spans",
    ]
    all_queries = entrymod.queries()
    for name in names:
        df = all_queries[name](spark, SF_DIR)
        (OUT / f"{name}_{TAG}.txt").write_text(fmt(df))
        print(f"wrote {name}_{TAG}.txt", flush=True)

    # media pairs (bench shape)
    frames = media_frame_hashes(documents_as_pages(spark, SF_DIR))
    pairs, _, cached = media_dup_pairs(frames, persist=False)
    (OUT / f"media_phash_pairs_{TAG}.txt").write_text(fmt(pairs))
    print("wrote media_phash_pairs", flush=True)

    # semdedup members (bench shape)
    emb_docs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sem_cents = train_ivf_centroids(emb_docs)
    members, _, cached = semdedup(emb_docs, sem_cents, eps=0.6)
    (OUT / f"semdedup_members_{TAG}.txt").write_text(fmt(members))
    for c in cached:
        c.unpersist()
    print("wrote semdedup_members", flush=True)

    # probe pairs (bench shape)
    cfg = _Cfg()
    docs = documents_as_pages(spark, SF_DIR).select(
        "url", extract_text_col(F.col("html")).alias("text")
    )
    with tempfile.TemporaryDirectory() as tmp:
        store_path = f"{tmp}/probe_store"
        compute_signatures(docs, cfg, keep_cols=["url", "text"]).write.parquet(
            store_path
        )
        store = spark.read.parquet(store_path)
        batch = docs.orderBy(F.xxhash64("url")).limit(250)
        pairs, overflow, cached = probe_near_dups(store, batch, cfg)
        (OUT / f"probe_batch250_{TAG}.txt").write_text(fmt(pairs.where("is_dup")))
        for c in cached:
            c.unpersist()
    print("wrote probe_batch250", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
