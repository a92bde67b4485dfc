"""Skew evidence: salted vs unsalted hot-bucket candidate generation.

The north rule requires skewed band buckets handled "via salted
repartitioning". This micro-bench builds the adversarial shape — one
mega-bucket (a boilerplate band-hash shared by millions of pages) plus a
cold long tail — and runs operators/bucket_join.bucket_pairs both ways on
the SAME input, asserting identical pair and drop counts.

Why the wall ratio understates the scale win: the unsalted shape ranks the
hot bucket with a row_number window over ONE partition — a single task
sorts all N hot rows serially, so its wall grows ~linearly in N while every
other task idles. The salted shape ranks per (key, salt): max task size is
~N/n_salts, so the stage parallelizes and the cap's per-salt quota bounds
output identically. At 10^12-doc scale the unsalted single task simply does
not finish (OOM or multi-hour straggler); here we demonstrate the shape
divergence at a size the sandbox can time.

Usage: python scripts/skew_bench.py [hot_rows] [cpus]   (defaults 2M, 8)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench_core import make_session  # noqa: E402
from video_duplicate_finder_python_spark.operators.bucket_join import (  # noqa: E402
    bucket_pairs,
)


def main() -> None:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = make_session(cpus)
    spark.range(1).count()  # warm

    hot = spark.range(hot_rows).select(
        F.lit(-1).alias("key"),
        F.concat(F.lit("h"), F.format_string("%09d", "id")).alias("url"),
    )
    cold = spark.range(hot_rows // 5).select(
        (F.col("id") % (hot_rows // 20)).alias("key"),
        F.concat(F.lit("c"), F.format_string("%09d", "id")).alias("url"),
    )
    df = hot.unionByName(cold).repartition(64).persist()
    df.count()

    results = {}
    for label, thr in [
        ("unsalted", None),
        ("salted", 65_536),
        ("unsalted", None),
        ("salted", 65_536),
    ]:
        t0 = time.time()
        pairs, dropped, _ = bucket_pairs(
            df, ["key"], max_bucket_size=256, salt_threshold=thr, n_salts=16
        )
        n, d = pairs.count(), int(dropped.first()[0] or 0)
        wall = time.time() - t0
        print(f"SAMPLE {label} pairs={n} dropped={d} wall={wall:.2f}s", flush=True)
        results.setdefault(label, {"n": n, "d": d, "walls": []})["walls"].append(wall)

    u, s = results["unsalted"], results["salted"]
    assert (u["n"], u["d"]) == (s["n"], s["d"]), "salted output must be identical"
    bu, bs = min(u["walls"]), min(s["walls"])
    print(
        f"REPORT hot_rows={hot_rows} cpus={cpus} unsalted_best={bu:.2f}s "
        f"salted_best={bs:.2f}s speedup={bu / bs:.2f}x identical_output=True"
    )


if __name__ == "__main__":
    main()
