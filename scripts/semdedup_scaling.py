"""SemDeDup scaling pairing — local[N] vs local[4N], fresh JVM per
sample (methodology of scripts/scaling_bench.py; additional evidence for
the round-6 operator — the north-rule bar is the text job's).

Usage:  python scripts/semdedup_scaling.py [n_vecs] [N] [four_n] [repeats]
Child:  python scripts/semdedup_scaling.py --one <cpus> <n_vecs>
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_one(cpus: int, n_vecs: int) -> None:
    import importlib.util
    import time

    from bench_core import make_session

    spec = importlib.util.spec_from_file_location(
        "sdemo", str(REPO / "scripts" / "scale_demo_new_ops.py")
    )
    m = importlib.util.module_from_spec(spec)
    saved, sys.argv = sys.argv, ["x"]
    spec.loader.exec_module(m)
    sys.argv = saved

    from video_duplicate_finder_python_spark.operators.ann import train_ivf_centroids
    from video_duplicate_finder_python_spark.operators.semdedup import semdedup

    spark = make_session(cpus)
    vecs = m.synth_vectors(spark, n_vecs)
    k = max(64, n_vecs // 400)
    t0 = time.monotonic()
    cents = train_ivf_centroids(vecs, n_centroids=k, train_size=min(n_vecs, 16384))
    members, dropped, cached = semdedup(vecs, cents, eps=0.01, persist=True)
    n_members = members.count()
    wall = time.monotonic() - t0
    for c in cached:
        c.unpersist()
    print(
        "RESULT "
        + json.dumps(
            {
                "n_vecs": n_vecs,
                "n_members": n_members,
                "wall_s": round(wall, 3),
                "vecs_per_sec": round(n_vecs / wall, 2),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


def child(cpus: int, n_vecs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--one", str(cpus), str(n_vecs)],
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
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n_low
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    samples: dict[int, list[dict]] = {n_low: [], n_high: []}
    for _ in range(repeats):
        for cpus in (n_low, n_high):
            r = child(cpus, n_vecs)
            print(f"SAMPLE local[{cpus}]: {json.dumps(r)}", flush=True)
            samples[cpus].append(r)
    best_low = max(samples[n_low], key=lambda r: r["vecs_per_sec"])
    best_high = max(samples[n_high], key=lambda r: r["vecs_per_sec"])
    if best_low["n_members"] != best_high["n_members"]:
        raise SystemExit(
            f"member count diverged: {best_low['n_members']} vs "
            f"{best_high['n_members']}"
        )
    eff = (best_high["vecs_per_sec"] / best_low["vecs_per_sec"]) / (n_high / n_low)
    print(
        "PAIRING "
        + json.dumps(
            {
                "n_vecs": n_vecs,
                "low_cpus": n_low,
                "high_cpus": n_high,
                "best_low_vps": best_low["vecs_per_sec"],
                "best_high_vps": best_high["vecs_per_sec"],
                "efficiency": round(eff, 3),
                "n_members": best_low["n_members"],
            }
        )
    )


if __name__ == "__main__":
    main()
