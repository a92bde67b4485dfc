"""dedup_pipeline stage-wall profile (round-7 harness): runs the bench's
headline job N times and prints per-stage walls + totals.

Usage: python scripts/profile_pipeline.py [sf_dir] [cpus] [reps]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_core import make_session, run_dedup_pipeline  # noqa: E402
from video_duplicate_finder_python_spark.sources.pages import (  # noqa: E402
    documents_as_pages,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = make_session(cpus)
    pages = documents_as_pages(spark, sf_dir)
    for rep in range(reps):
        res = run_dedup_pipeline(spark, pages)
        print(
            f"rep{rep}: wall={res['wall_s']} stages="
            + json.dumps(res["stage_wall_s"]),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
