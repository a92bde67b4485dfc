"""Phase-level profile of probe_near_dups (round-7 measurement harness).

Reproduces bench.py's probe_batch250 setup exactly, then times:
  - the full probe action (as the bench does), and
  - each internal phase in isolation (batch signatures, candidate tables,
    degree/overflow, verify) by forcing sub-plans with the noop sink.

Usage: python scripts/profile_probe.py [sf_dir] [cpus]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_core import make_session  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from video_duplicate_finder_python_spark import DedupConfig as _Cfg
    from video_duplicate_finder_python_spark.functions.text import (
        extract_text_col as _extract,
    )
    from video_duplicate_finder_python_spark.operators.incremental_probe import (
        probe_near_dups,
    )
    from video_duplicate_finder_python_spark.operators.signature_stage import (
        compute_signatures as _sigs,
    )
    from video_duplicate_finder_python_spark.sources.pages import documents_as_pages

    spark = make_session(cpus)
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

        # --- end-to-end, exactly as the bench times it (3 reps) ----------
        for rep in range(3):
            t0 = time.monotonic()
            pairs, overflow, cached = probe_near_dups(_store, _batch, _cfg)
            force(pairs.where("is_dup"))
            print(f"e2e rep{rep}: {time.monotonic() - t0:.3f}s", flush=True)
            for c in cached:
                c.unpersist()

        # --- phase isolation ---------------------------------------------
        from video_duplicate_finder_python_spark.operators.lsh import explode_bands
        from video_duplicate_finder_python_spark.operators.signature_stage import (
            compute_signatures,
        )

        sc = spark.sparkContext

        def phase(name, fn):
            t0 = time.monotonic()
            sc.setJobDescription(f"probe-profile: {name}")
            out = fn()
            print(f"phase {name}: {time.monotonic() - t0:.3f}s", flush=True)
            sc.setJobDescription(None)
            return out

        store = _store.join(
            F.broadcast(_batch.select("url").distinct()), "url", "left_anti"
        )
        sigs_new = compute_signatures(_batch, _cfg, keep_cols=["url", "text"])
        from pyspark.storagelevel import StorageLevel

        sigs_new = sigs_new.persist(StorageLevel.MEMORY_AND_DISK)
        phase("A batch signatures (persist+force)", lambda: force(sigs_new))

        bands_new = explode_bands(sigs_new, _cfg).withColumnRenamed("url", "new_url")
        bands_store = explode_bands(store, _cfg)
        phase(
            "B band probe store x batch",
            lambda: force(
                bands_store.join(F.broadcast(bands_new), ["band_id", "band_hash"])
                .where(F.col("url") != F.col("new_url"))
                .select("new_url", F.col("url").alias("other_url"))
            ),
        )
        fp_new = sigs_new.select(
            F.col("url").alias("new_url"), F.explode("fingerprints").alias("fp")
        )
        fp_store = store.select("url", F.explode("fingerprints").alias("fp"))
        phase(
            "C fp probe store x batch",
            lambda: force(
                fp_store.join(F.broadcast(fp_new), "fp")
                .where(F.col("url") != F.col("new_url"))
                .select("new_url", F.col("url").alias("other_url"))
            ),
        )
        b2 = bands_new.withColumnRenamed("new_url", "other_url")
        phase(
            "D within-batch band self-join",
            lambda: force(
                bands_new.join(b2, ["band_id", "band_hash"]).where(
                    F.col("new_url") < F.col("other_url")
                )
            ),
        )
        fp2 = fp_new.withColumnRenamed("new_url", "other_url")
        phase(
            "E within-batch fp self-join",
            lambda: force(
                fp_new.join(fp2, "fp").where(F.col("new_url") < F.col("other_url"))
            ),
        )
        sigs_new.unpersist()

        # full probe again but timing construction vs action
        t0 = time.monotonic()
        pairs, overflow, cached = probe_near_dups(_store, _batch, _cfg)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        force(pairs.where("is_dup"))
        t_act = time.monotonic() - t0
        print(f"build {t_build:.3f}s action {t_act:.3f}s", flush=True)
        for c in cached:
            c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
