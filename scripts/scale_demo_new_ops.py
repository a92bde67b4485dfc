"""Capacity demonstration for the round-6 operators — three demos, one
JSON line each, with planted-duplicate ground truth (the same evidence
shape as the 300k/1M text-pipeline runs, BENCH/SCALING_R6_*.md):

1. perceptual-hash media dedup at ~100x the bench scale;
2. SemDeDup at ~100x the bench scale;
3. the incremental near-dup probe: a 5k-doc batch against a 300k-doc
   signature store (store build + batch materialization are charged to
   setup, not to the probe wall; resize via demo_probe's n_store/n_batch
   params when calling it directly).

Demo 1/2 inputs are synthesized INSIDE Spark (pure-JVM expressions, no
driver-side data): deterministic pseudo-random media bytes / embedding
vectors from xxhash64 chains, with every K-th item an exact (media) or
near (embedding) duplicate of its predecessor. Demo 3 reuses the scaling
bench's synthetic page corpus as the store and probes 50% byte-exact
copies + 50% fresh docs. So each demo measures its operator, not a
driver bottleneck, and recall has closed-form ground truth.

Usage:
    python scripts/scale_demo_new_ops.py [n_media] [n_vectors] [cpus]
defaults: 100_000 media docs, 200_000 vectors, 32 cpus (the probe demo's
300k/5k sizes are fixed in main()).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_MEDIA = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DUP_EVERY = 10  # id % DUP_EVERY == 1 duplicates id - 1
DIM = 64


def synth_media(spark, n: int):
    """(url, html: binary): ~2-10 KiB deterministic pseudo-random bytes;
    every DUP_EVERY-th doc byte-identical to its predecessor."""
    from pyspark.sql import functions as F

    base = F.when(
        (F.col("id") % DUP_EVERY == 1) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    # 64..319 md5 hex blocks of 32 bytes -> 2-10 KiB, content keyed on base
    n_blocks = ((F.xxhash64(base) % 256 + 320) % 256 + 64).cast("int")
    payload = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_blocks),
            lambda i: F.md5(F.concat(base.cast("string"), F.lit(":"), i.cast("string"))),
        ),
        "",
    )
    return spark.range(n).select(
        F.concat(F.lit("m://"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("url"),
        F.encode(payload, "UTF-8").alias("html"),
    )


def demo_media(spark) -> dict:
    from video_duplicate_finder_python_spark.operators.media_dedup import (
        media_dup_pairs,
        media_frame_hashes,
    )

    docs = synth_media(spark, N_MEDIA)
    t0 = time.monotonic()
    frames = media_frame_hashes(docs)
    pairs, dropped, cached = media_dup_pairs(frames, persist=True)
    n_pairs = pairs.count()
    n_dropped = dropped.collect()[0][0]
    wall = time.monotonic() - t0
    # ground truth: (id-1, id) for id%DUP_EVERY==1 — exact dups score 1.0
    expected = (N_MEDIA - 1) // DUP_EVERY + (1 if (N_MEDIA - 1) % DUP_EVERY >= 1 else 0)
    from pyspark.sql import functions as F

    found = pairs.where(
        (F.substring("url_b", 5, 9).cast("bigint") % DUP_EVERY == 1)
        & (
            F.substring("url_b", 5, 9).cast("bigint")
            - F.substring("url_a", 5, 9).cast("bigint")
            == 1
        )
        & (F.col("score") >= 0.999)
    ).count()
    for c in cached:
        c.unpersist()
    return {
        "demo": "media_phash_dedup",
        "n_docs": N_MEDIA,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(N_MEDIA / wall, 1),
        "n_pairs": n_pairs,
        "dropped_bucket_members": n_dropped,
        "planted_exact_dups": expected,
        "planted_found": found,
        "recall": round(found / expected, 4),
        "cpus": CPUS,
    }


def synth_vectors(spark, n: int):
    """(vec_id, embedding: array<float>): unit-scale pseudo-random dim-64
    vectors; every DUP_EVERY-th vector a tiny perturbation of its
    predecessor (cosine > 0.999)."""
    from pyspark.sql import functions as F

    base = F.when(
        (F.col("id") % DUP_EVERY == 1) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.pmod(F.xxhash64(base * DIM + i), F.lit(20001)) / 10000.0 - 1.0
        ).cast("float"),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id") * DIM + i + 7), F.lit(2001)) / 100000.0
            - 0.01
        ).cast("float"),
    )
    emb = F.zip_with(vec, noise, lambda a, b: a + b)
    return spark.range(n).select(F.col("id").alias("vec_id"), emb.alias("embedding"))


def demo_semdedup(spark) -> dict:
    from video_duplicate_finder_python_spark.operators.ann import train_ivf_centroids
    from video_duplicate_finder_python_spark.operators.semdedup import semdedup

    vecs = synth_vectors(spark, N_VECS)
    # SemDeDup scales k with n (the paper's 11k clusters at 5B): cells of
    # ~n/k members bound the within-cell quadratic work
    k = max(64, int((N_VECS / 400)))
    t0 = time.monotonic()
    cents = train_ivf_centroids(vecs, n_centroids=k, train_size=min(N_VECS, 16384))
    members, dropped, cached = semdedup(vecs, cents, eps=0.01, persist=True)
    n_members = members.count()
    kept = members.where("is_kept").count()
    n_dropped = dropped.collect()[0][0]
    wall = time.monotonic() - t0
    expected = (N_VECS - 1) // DUP_EVERY + (1 if (N_VECS - 1) % DUP_EVERY >= 1 else 0)
    from pyspark.sql import functions as F

    found = (
        members.alias("a")
        .join(
            members.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("b.vec_id") - F.col("a.vec_id") == 1)
            & (F.col("b.vec_id") % DUP_EVERY == 1),
        )
        .count()
    )
    for c in cached:
        c.unpersist()
    return {
        "demo": "semdedup",
        "n_vectors": N_VECS,
        "n_centroids": k,
        "wall_s": round(wall, 2),
        "vecs_per_sec": round(N_VECS / wall, 1),
        "group_members": n_members,
        "kept": kept,
        "dropped_cell_members": n_dropped,
        "planted_near_dups": expected,
        "planted_same_cluster": found,
        "recall": round(found / expected, 4),
        "cpus": CPUS,
    }




def demo_probe(spark, n_store: int = 300_000, n_batch: int = 5_000) -> dict:
    """O(delta) evidence for the incremental probe: a small batch against
    a corpus-scale signature store, vs the O(corpus) full pipeline the
    same question would otherwise cost (BENCH/SCALING_* measures that at
    ~200-650 s for this store size). Store = the scaling bench's 300k
    synthetic page corpus; batch = 50% byte-exact copies of store docs
    (expected hits) + 50% fresh docs (expected misses)."""
    from pyspark.sql import functions as F

    from video_duplicate_finder_python_spark import DedupConfig
    from video_duplicate_finder_python_spark.functions.text import extract_text_col
    from video_duplicate_finder_python_spark.operators.incremental_probe import (
        probe_near_dups,
    )
    from video_duplicate_finder_python_spark.operators.signature_stage import (
        compute_signatures,
    )

    cfg = DedupConfig()
    corpus = f"/tmp/vdf_bench_corpus_{n_store}"
    from bench_core import synth_corpus_parquet

    synth_corpus_parquet(spark, corpus, n_store)
    pages = spark.read.parquet(corpus)
    docs = pages.select("url", extract_text_col(F.col("html")).alias("text"))
    store_path = f"/tmp/vdf_probe_store_{n_store}"
    t0 = time.monotonic()
    compute_signatures(docs, cfg, keep_cols=["url", "text"]).write.mode(
        "overwrite"
    ).parquet(store_path)
    build_s = time.monotonic() - t0
    store = spark.read.parquet(store_path)

    half = n_batch // 2
    copies = (
        docs.orderBy(F.xxhash64("url"))
        .limit(half)
        .select(F.concat(F.lit("probe-copy:"), "url").alias("url"), "text")
    )
    fresh = spark.range(n_batch - half).select(
        F.concat(F.lit("probe-fresh:"), F.col("id").cast("string")).alias("url"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(150)),
                lambda i: F.concat(
                    F.lit("fz"), F.col("id").cast("string"), F.lit("t"), i.cast("string")
                ),
            ),
        ).alias("text"),
    )
    # materialize the batch BEFORE the clock: deriving the copies needs a
    # full corpus extraction pass, which is demo setup, not probe cost
    batch_path = f"/tmp/vdf_probe_batch_{n_store}_{n_batch}"
    copies.unionByName(fresh).write.mode("overwrite").parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    t0 = time.monotonic()
    pairs, overflow, cached = probe_near_dups(store, batch, cfg)
    dup = pairs.where("is_dup").persist()
    n_pairs = dup.count()
    hit_docs = dup.select("new_url").distinct().count()
    n_overflow = overflow.count()
    wall = time.monotonic() - t0
    dup.unpersist()
    for c in cached:
        c.unpersist()
    return {
        "demo": "incremental_probe",
        "store_docs": n_store,
        "batch_docs": n_batch,
        "store_build_s": round(build_s, 2),
        "probe_wall_s": round(wall, 2),
        "batch_docs_per_sec": round(n_batch / wall, 1),
        "dup_pairs": n_pairs,
        "batch_docs_with_dup": hit_docs,
        "expected_copy_docs": half,
        "overflow_docs": n_overflow,
        "cpus": CPUS,
    }


def main() -> None:
    from bench_core import make_session

    spark = make_session(CPUS)
    for fn in (demo_media, demo_semdedup, demo_probe):
        print("SCALE_DEMO " + json.dumps(fn(spark)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
