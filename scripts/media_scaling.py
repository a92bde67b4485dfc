"""Media pHash dedup scaling pairing — local[N] vs local[4N], fresh JVM
per sample (same methodology as scripts/scaling_bench.py; the north
rule's scaling bar applies to the TEXT dedup job, measured in
BENCH/SCALING_R6_*.md — this pairing is additional evidence that the
round-6 media operator scales the same way).

The input is synthesized in-Spark from xxhash64 chains
(scale_demo_new_ops.synth_media) — deterministic for a given n at ANY
parallelism level, so the pair count doubles as the parallelism-
invariance check.

Usage:  python scripts/media_scaling.py [n_docs] [N] [four_n] [repeats]
Child:  python scripts/media_scaling.py --one <cpus> <n_docs>
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_one(cpus: int, n_docs: int) -> None:
    import time

    from bench_core import make_session

    sys.path.insert(0, str(REPO / "scripts"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sdemo", str(REPO / "scripts" / "scale_demo_new_ops.py")
    )
    m = importlib.util.module_from_spec(spec)
    saved, sys.argv = sys.argv, ["x"]
    spec.loader.exec_module(m)
    sys.argv = saved

    from video_duplicate_finder_python_spark.operators.media_dedup import (
        media_dup_pairs,
        media_frame_hashes,
    )

    spark = make_session(cpus)
    docs = m.synth_media(spark, n_docs)
    t0 = time.monotonic()
    frames = media_frame_hashes(docs)
    pairs, dropped, cached = media_dup_pairs(frames, persist=True)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0
    for c in cached:
        c.unpersist()
    print(
        "RESULT "
        + json.dumps(
            {
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "wall_s": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


def child(cpus: int, n_docs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--one", str(cpus), str(n_docs)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child {cpus} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n_low
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    samples: dict[int, list[dict]] = {n_low: [], n_high: []}
    for _ in range(repeats):
        for cpus in (n_low, n_high):
            r = child(cpus, n_docs)
            print(f"SAMPLE local[{cpus}]: {json.dumps(r)}", flush=True)
            samples[cpus].append(r)
    best_low = max(samples[n_low], key=lambda r: r["docs_per_sec"])
    best_high = max(samples[n_high], key=lambda r: r["docs_per_sec"])
    if best_low["n_pairs"] != best_high["n_pairs"]:
        raise SystemExit(
            f"pair count diverged across levels: {best_low['n_pairs']} vs "
            f"{best_high['n_pairs']}"
        )
    eff = (best_high["docs_per_sec"] / best_low["docs_per_sec"]) / (n_high / n_low)
    print(
        "PAIRING "
        + json.dumps(
            {
                "n_docs": n_docs,
                "low_cpus": n_low,
                "high_cpus": n_high,
                "best_low_dps": best_low["docs_per_sec"],
                "best_high_dps": best_high["docs_per_sec"],
                "efficiency": round(eff, 3),
                "n_pairs": best_low["n_pairs"],
            }
        )
    )


if __name__ == "__main__":
    main()
