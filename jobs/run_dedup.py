"""Cluster job entrypoint — the spark-submit analog of the reference's
``VideoScanner.scan_directory`` CLI-less flow (SURVEY.md §3 E1).

Usage (multi-executor cluster or local):

    scripts/build_artifact.sh
    spark-submit --py-files dist/vdf_spark.zip jobs/run_dedup.py \
        --input  s3://bucket/pages/          \
        --output s3://bucket/dedup/clusters  \
        --checkpoint-dir s3://bucket/dedup/checkpoints \
        [--jaccard-threshold 0.8] [--bands 16] [--rows-per-band 8]

The job is rerun-safe: stages resume from the checkpoint dir by
fingerprint; the final write is an idempotent overwrite (the reference's
delete-then-insert semantics, database.py:196-209). Checkpoint
invalidation keys on (row count, url, warc_ts, length(html)) — the
size+mtime analog of the reference's staleness check — so a re-crawl
landing under the same urls recomputes every stage even when it reuses
the old timestamps, unless the rewrite preserves every page's byte
length exactly. For that last residual (or to skip the digest scan
entirely), pass a fresh ``input_token`` (e.g. the Iceberg snapshot id)
through ``DedupPipeline.run`` or clear the checkpoint dir.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="near-duplicate detection pipeline")
    p.add_argument("--input", required=True, help="pages table path (parquet)")
    p.add_argument("--output", required=True, help="clusters output path (parquet)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--pairs-output", default=None, help="optional verified-pairs path")
    p.add_argument("--langs", default=None, help="comma-separated lang filter")
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--rows-per-band", type=int, default=8)
    p.add_argument("--substring-min-len", type=int, default=500)
    p.add_argument("--max-bucket-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--retention-output",
        default=None,
        help="optional path: per-cluster keep/drop decisions "
        "(url, cluster_id, is_kept — one kept member per cluster, longest "
        "extracted text first, url tiebreak)",
    )
    p.add_argument(
        "--suffix-array-group",
        default=None,
        metavar="SQL_EXPR",
        help="enable the per-group generalized suffix-array candidate "
        "source, grouped by this SQL expression (e.g. "
        "\"parse_url(url, 'HOST')\"); adds it to the default "
        "minhash+simhash+CDC sources",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline
    from video_duplicate_finder_python_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("vdf-dedup").getOrCreate()
    spark.sparkContext.setJobGroup("vdf-dedup", "near-duplicate detection", True)

    extra = {}
    if args.suffix_array_group:
        extra = {
            "candidate_sources": ("minhash", "simhash", "suffix", "suffix_array"),
            "suffix_group_expr": args.suffix_array_group,
        }
    cfg = DedupConfig(
        jaccard_threshold=args.jaccard_threshold,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        num_perm=args.bands * args.rows_per_band,
        substring_min_len=args.substring_min_len,
        max_bucket_size=args.max_bucket_size,
        seed=args.seed,
        **extra,
    )
    langs = args.langs.split(",") if args.langs else None
    pages = read_pages(spark, args.input, langs=langs)

    t0 = time.monotonic()
    res = DedupPipeline(spark, cfg, checkpoint_dir=args.checkpoint_dir).run(pages)
    res.clusters.write.mode("overwrite").parquet(args.output)
    if args.pairs_output:
        res.pairs.write.mode("overwrite").parquet(args.pairs_output)
    if args.retention_output:
        from pyspark.sql import functions as F

        from video_duplicate_finder_python_spark.operators.retention import (
            cluster_retention,
        )

        docs = pages.select("url", F.length("text").alias("n_chars"))
        cluster_retention(res.clusters, docs).write.mode("overwrite").parquet(
            args.retention_output
        )
    wall = time.monotonic() - t0

    summary = {
        "wall_s": round(wall, 2),
        "stages": {k: {"rows": v["rows_out"], "wall_s": round(v["wall_s"], 2), "cached": v["cached"]}
                   for k, v in res.metrics.items()},
        "output": args.output,
    }
    print("VDF_DEDUP_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
