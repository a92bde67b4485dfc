"""Focused re-measurement of individual bench lines (round-7 A/B tool):
times the named queries exactly as bench.py does (best-of-3 noop force)
plus optionally the media pairs line. Does NOT replace bench.py (frozen);
numbers quoted in OPTIMIZATION_r07.md.

Usage: python scripts/bench_lines.py name1,name2,... [sf_dir] [cpus]
       (use 'media' for the media_phash_pairs shape)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_core import make_session  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_of(make_df, repeats: int = 3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        force(make_df())
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import __spark_entry__ as entrymod

    spark = make_session(cpus)
    all_queries = entrymod.queries()
    for name in names:
        if name == "media":
            from video_duplicate_finder_python_spark.operators.media_dedup import (
                media_dup_pairs,
                media_frame_hashes,
            )
            from video_duplicate_finder_python_spark.sources.pages import (
                documents_as_pages,
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

            print(f"media_phash_pairs: {round(min(media_run() for _ in range(3)), 3)}",
                  flush=True)
            continue
        t = best_of(lambda: all_queries[name](spark, sf_dir))
        print(f"{name}: {t}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
