"""Training-corpus cleaning job — the full LLM-data pipeline as ONE
spark-submit entrypoint, composing the engine's operators in the order
published web pipelines use (C4 / Gopher / RefinedWeb lineage: URL
canonicalization → quality filter → fuzzy dedup + retention → cross-doc
line dedup → PII scrub):

    scripts/build_artifact.sh
    spark-submit --py-files dist/vdf_spark.zip jobs/clean_corpus.py \
        --input  s3://bucket/pages/          \
        --output s3://bucket/clean/corpus    \
        [--langs en] [--chunk-tokens 10] [--jaccard-threshold 0.8] \
        [--checkpoint-dir s3://bucket/clean/ckpt] \
        [--no-url-dedup] [--no-quality] [--no-fuzzy] [--no-line-dedup] \
        [--no-pii]

Every stage boundary is persisted (MEMORY_AND_DISK — spills, never OOMs)
and counted, so the printed ``VDF_CLEAN_SUMMARY`` JSON carries docs
in/out per stage plus per-rule quality-drop counts — the lineage +
counters contract the north rule asks of every run. Stage order notes:

- URL dedup first: it's the cheapest reducer (groupBy on short canonical
  strings) and every later stage scales with surviving docs.
- Quality filter before fuzzy dedup: junk docs must not burn signature /
  LSH work, and Gopher rules are per-doc (no cross-doc dependency).
- Fuzzy dedup on the ORIGINAL extracted text (the byte-identical
  extraction invariant vs the reference holds inside DedupPipeline);
  retention keeps the longest member per cluster, singletons pass
  through implicitly.
- Line dedup after doc dedup: cluster losers are already gone, so
  boilerplate counting isn't inflated by near-identical copies.
- PII scrub LAST: scrub tokens (``<EMAIL>`` etc.) must not participate
  in any similarity computation.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="LLM training-corpus cleaning pipeline")
    p.add_argument("--input", required=True, help="pages table path (parquet)")
    p.add_argument("--output", required=True, help="cleaned corpus output (parquet)")
    p.add_argument("--checkpoint-dir", default=None, help="fuzzy-dedup stage checkpoints")
    p.add_argument("--langs", default=None, help="comma-separated lang filter")
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--chunk-tokens", type=int, default=10, help="line-dedup chunk size")
    p.add_argument("--min-tokens", type=int, default=50, help="Gopher min doc tokens")
    p.add_argument(
        "--quality-rules",
        default="all",
        help="comma-selected Gopher rules (too_short,too_long,bad_word_len,"
        "no_stopwords,repetitive) or 'all'. The stopword rule uses an "
        "ENGLISH list — deselect it for non-English corpora or it drops "
        "everything.",
    )
    p.add_argument("--no-url-dedup", action="store_true")
    p.add_argument("--no-quality", action="store_true")
    p.add_argument("--no-fuzzy", action="store_true")
    p.add_argument("--no-line-dedup", action="store_true")
    p.add_argument("--no-pii", action="store_true")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline
    from video_duplicate_finder_python_spark.functions.pii import scrub_pii
    from video_duplicate_finder_python_spark.functions.textstats import gopher_flags
    from video_duplicate_finder_python_spark.functions.urlnorm import canonicalize_url
    from video_duplicate_finder_python_spark.operators.line_dedup import (
        drop_cross_doc_duplicate_lines,
    )
    from video_duplicate_finder_python_spark.operators.retention import (
        cluster_retention,
    )
    from video_duplicate_finder_python_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("vdf-clean-corpus").getOrCreate()
    spark.sparkContext.setJobGroup("vdf-clean", "corpus cleaning pipeline", True)

    t_total = time.monotonic()
    stages: dict[str, dict] = {}
    cached: list = []

    def boundary(name: str, df, extra: dict | None = None):
        """Persist + count a stage output; record docs_out and wall."""
        t0 = time.monotonic()
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(df)
        n = df.count()
        stages[name] = {"docs_out": n, "wall_s": round(time.monotonic() - t0, 2)}
        if extra:
            stages[name].update(extra)
        return df

    langs = args.langs.split(",") if args.langs else None
    pages = boundary("read", read_pages(spark, args.input, langs=langs))

    # 1. canonical-URL dedup in two skew-free aggregates, no window:
    # (a) collapse RECRAWLS of the same url (a crawl table can carry one
    # row per snapshot) to the newest/longest row via max_by — without
    # this, every same-url row survives the canonical join below and
    # downstream url-keyed joins multiply rows; (b) one survivor per
    # canonical form (smallest raw url — deterministic).
    if not args.no_url_dedup:
        canon = pages.withColumn("_canon", canonicalize_url(F.col("url")))
        rank = F.struct(
            F.col("warc_ts").isNotNull().cast("int").alias("has_ts"),
            F.col("warc_ts").alias("ts"),
            F.length("text").alias("n_chars"),
            F.xxhash64(F.col("html")).alias("tiebreak"),
        )
        payload = [c for c in canon.columns if c != "url"]
        per_url = (
            canon.groupBy("url")
            .agg(F.max_by(F.struct(*payload), rank).alias("_row"))
            .select("url", "_row.*")
        )
        winners = per_url.groupBy("_canon").agg(F.min("url").alias("url"))
        pages = boundary(
            "url_dedup", per_url.join(winners, ["_canon", "url"]).drop("_canon")
        )

    # 2. Gopher-style quality filter, with per-rule drop counts
    if not args.no_quality:
        flags = gopher_flags(F.col("text"), min_tokens=args.min_tokens)
        if args.quality_rules != "all":
            selected = {r.strip() for r in args.quality_rules.split(",") if r.strip()}
            if not selected:
                raise SystemExit(
                    "--quality-rules: empty selection — pass rule names or "
                    "'all', or use --no-quality to skip the stage"
                )
            unknown = selected - (set(flags) - {"keep"})
            if unknown:
                raise SystemExit(f"--quality-rules: unknown rules {sorted(unknown)}")
            flags = {k: v for k, v in flags.items() if k in selected}
            keep = F.lit(True)
            for c in flags.values():
                keep = keep & ~c
            flags["keep"] = keep
        flagged = pages.select(
            "*", *[c.alias(f"_g_{k}") for k, c in flags.items()]
        )
        rule_counts = flagged.agg(
            *[
                F.sum(F.col(f"_g_{k}").cast("bigint")).alias(k)
                for k in flags
                if k != "keep"
            ]
        ).collect()[0]
        pages = boundary(
            "quality",
            flagged.where(F.col("_g_keep")).drop(*[f"_g_{k}" for k in flags]),
            extra={"rule_drops": rule_counts.asDict()},
        )

    # 3. fuzzy dedup (MinHash+SimHash+CDC) + retention: drop cluster
    # members that are not the kept representative; singletons (no
    # cluster row) pass through the left_anti/semi composition untouched
    if not args.no_fuzzy:
        cfg = DedupConfig(jaccard_threshold=args.jaccard_threshold)
        res = DedupPipeline(spark, cfg, checkpoint_dir=args.checkpoint_dir).run(pages)
        docs = pages.select("url", F.length("text").alias("n_chars"))
        decisions = cluster_retention(res.clusters, docs)
        losers = decisions.where(~F.col("is_kept")).select("url")
        pages = boundary(
            "fuzzy_dedup",
            pages.join(losers, "url", "left_anti"),
            extra={"clusters": res.clusters.select("cluster_id").distinct().count()},
        )

    # 4. cross-doc line dedup (RefinedWeb semantics) on the survivors.
    # `cleaned` feeds TWO actions (the drop-count aggregate and the
    # boundary count/write) — persist it or the chunk explode + two
    # groupBys run twice (measured: the un-persisted shape doubled this
    # stage's wall in the 300k capacity run)
    if not args.no_line_dedup:
        cleaned = drop_cross_doc_duplicate_lines(
            pages, id_col="url", text_col="text", chunk_tokens=args.chunk_tokens
        ).persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(cleaned)
        dropped_chunks = cleaned.agg(F.sum("n_dropped")).collect()[0][0] or 0
        pages = boundary(
            "line_dedup",
            pages.drop("text").join(
                cleaned.select(
                    F.col("doc_id").alias("url"), F.col("cleaned_text").alias("text")
                ),
                "url",
            ),
            extra={"dropped_chunks": int(dropped_chunks)},
        )

    # 5. PII scrub, last — scrub tokens never feed similarity
    if not args.no_pii:
        pages = pages.withColumn("text", scrub_pii(F.col("text")))

    out_cols = [c for c in ("url", "warc_ts", "lang", "text") if c in pages.columns]
    pages.select(*out_cols).write.mode("overwrite").parquet(args.output)

    for df in cached:
        df.unpersist()

    summary = {
        "wall_s": round(time.monotonic() - t_total, 2),
        "stages": stages,
        "output": args.output,
    }
    print("VDF_CLEAN_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
