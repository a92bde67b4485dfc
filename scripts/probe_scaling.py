"""Incremental-probe scaling pairing — local[N] vs local[4N], fresh JVM
per sample (methodology of scripts/semdedup_scaling.py; evidence for the
round-6 probe operator after the round-7 plan-truncation/merged-scan
rework).

Setup (untimed, built once and shared): a seeded synthetic page corpus
(bench_core.synth_corpus_parquet) is signed and written as the store
parquet; the probe batch is half byte-copies of store docs, half fresh
synthetic docs (the bench.py probe_batch250 recipe, scaled).

Measured span per sample: ONE probe_near_dups(store, batch, cfg) call +
the noop force of pairs.where(is_dup) — the operational "which of
today's docs duplicate something we have?" path, both candidate sources.

Usage:  python scripts/probe_scaling.py [store_docs] [batch_docs] [N] [four_n] [repeats]
Child:  python scripts/probe_scaling.py --one <cpus> <store_docs> <batch_docs> <workdir>
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_setup(workdir: str, store_docs: int, batch_docs: int) -> None:
    """One-time corpus + store + batch parquet build (untimed setup)."""
    import time

    from pyspark.sql import functions as F

    from bench_core import make_session, synth_corpus_parquet
    from video_duplicate_finder_python_spark import DedupConfig
    from video_duplicate_finder_python_spark.functions.text import extract_text_col
    from video_duplicate_finder_python_spark.operators.signature_stage import (
        compute_signatures,
    )

    t0 = time.monotonic()
    spark = make_session(8)
    corpus = synth_corpus_parquet(spark, f"{workdir}/corpus", store_docs)
    pages = spark.read.parquet(corpus)
    docs = pages.select("url", extract_text_col(F.col("html")).alias("text"))
    cfg = DedupConfig()
    compute_signatures(docs, cfg, keep_cols=["url", "text"]).write.mode(
        "overwrite"
    ).parquet(f"{workdir}/store")
    half = batch_docs // 2
    copies = docs.orderBy(F.xxhash64("url")).limit(half).select(
        F.concat(F.lit("copy:"), "url").alias("url"), "text"
    )
    fresh = spark.range(batch_docs - half).select(
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
    copies.unionByName(fresh).write.mode("overwrite").parquet(f"{workdir}/batch")
    spark.stop()
    print(f"SETUP done in {time.monotonic() - t0:.1f}s", flush=True)


def run_one(cpus: int, store_docs: int, batch_docs: int, workdir: str) -> None:
    import time

    from bench_core import make_session
    from video_duplicate_finder_python_spark import DedupConfig
    from video_duplicate_finder_python_spark.operators.incremental_probe import (
        probe_near_dups,
    )

    spark = make_session(cpus)
    store = spark.read.parquet(f"{workdir}/store")
    batch = spark.read.parquet(f"{workdir}/batch")
    cfg = DedupConfig()
    t0 = time.monotonic()
    pairs, overflow, cached = probe_near_dups(store, batch, cfg)
    dup = pairs.where("is_dup")
    n_pairs = dup.count()
    dup.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    for c in cached:
        c.unpersist()
    print(
        "RESULT "
        + json.dumps(
            {
                "store_docs": store_docs,
                "batch_docs": batch_docs,
                "n_dup_pairs": n_pairs,
                "wall_s": round(wall, 3),
                "batch_docs_per_sec": round(batch_docs / wall, 2),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


def child(cpus: int, store_docs: int, batch_docs: int, workdir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--one", str(cpus), str(store_docs),
         str(batch_docs), workdir],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child {cpus} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return
    store_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * n_low
    repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    with tempfile.TemporaryDirectory() as workdir:
        build_setup(workdir, store_docs, batch_docs)
        samples: dict[int, list[dict]] = {n_low: [], n_high: []}
        for _ in range(repeats):
            for cpus in (n_low, n_high):
                r = child(cpus, store_docs, batch_docs, workdir)
                print(f"SAMPLE local[{cpus}]: {json.dumps(r)}", flush=True)
                samples[cpus].append(r)
        best_low = max(samples[n_low], key=lambda r: r["batch_docs_per_sec"])
        best_high = max(samples[n_high], key=lambda r: r["batch_docs_per_sec"])
        if best_low["n_dup_pairs"] != best_high["n_dup_pairs"]:
            raise SystemExit(
                f"pair count diverged: {best_low['n_dup_pairs']} vs "
                f"{best_high['n_dup_pairs']}"
            )
        eff = (
            best_high["batch_docs_per_sec"] / best_low["batch_docs_per_sec"]
        ) / (n_high / n_low)
        print(
            "PAIRING "
            + json.dumps(
                {
                    "store_docs": store_docs,
                    "batch_docs": batch_docs,
                    "low_cpus": n_low,
                    "high_cpus": n_high,
                    "best_low_dps": best_low["batch_docs_per_sec"],
                    "best_high_dps": best_high["batch_docs_per_sec"],
                    "efficiency": round(eff, 3),
                    "n_dup_pairs": best_low["n_dup_pairs"],
                }
            )
        )


if __name__ == "__main__":
    main()
