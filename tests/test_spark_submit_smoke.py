"""spark-submit packaging smoke (round-3 verdict #8 / round-4 #5): the
README-advertised deployment path — ``scripts/build_artifact.sh`` then
``spark-submit --py-files dist/vdf_spark.zip jobs/run_dedup.py`` — must
actually run end-to-end, in a fresh JVM that imports the engine ONLY from
the zip artifact, and produce the exact oracle clustering."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def test_spark_submit_py_files_end_to_end(tmp_path):
    from video_duplicate_finder_python_spark.corpus import generate_corpus
    from video_duplicate_finder_python_spark.oracle import run_oracle

    # 1. package the artifact fresh (so the zip ships the code under test)
    subprocess.run(
        ["bash", str(REPO / "scripts" / "build_artifact.sh")],
        check=True,
        capture_output=True,
        cwd=str(REPO),
    )
    zip_path = REPO / "dist" / "vdf_spark.zip"
    assert zip_path.exists()

    # 2. seeded corpus written as the pages parquet input
    corpus = generate_corpus(seed=42, n_docs=120)
    inp = tmp_path / "pages"
    inp.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    # us-precision timestamps: Spark 4 rejects pyarrow's default
    # TIMESTAMP(NANOS) parquet logical type (PARQUET_TYPE_ILLEGAL)
    pq.write_table(
        pa.Table.from_pandas(corpus.pages),
        str(inp / "pages.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )

    out = tmp_path / "clusters"
    ckpt = tmp_path / "ckpt"

    # 3. the advertised cluster-job invocation; cwd is NOT the repo and
    # PYTHONPATH is stripped, so the engine import must come from --py-files
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "jobs" / "run_dedup.py"),
            "--input", str(inp),
            "--output", str(out),
            "--checkpoint-dir", str(ckpt),
            "--retention-output", str(tmp_path / "retention"),
            # round-6 (VERDICT r5 #7): the opt-in 4th candidate source runs
            # through the packaged artifact too — host-grouped generalized
            # suffix array; output must still be the exact oracle
            # clustering (the suffix pass adds only true >=min_len-span
            # pairs, which the CDC source already covers on this corpus)
            "--suffix-array-group", "parse_url(url, 'HOST')",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("VDF_DEDUP_SUMMARY ")
    ]
    assert summary_lines, proc.stdout[-2000:]
    summary = json.loads(summary_lines[-1][len("VDF_DEDUP_SUMMARY "):])
    assert summary["stages"]["clusters"]["rows"] > 0

    # 4. the job's output parquet must be the exact oracle clustering
    import duckdb

    oracle = run_oracle(corpus.pages, corpus.truth_pairs)
    expected = dict(oracle.clusters[["url", "cluster_id"]].values)
    got_df = duckdb.sql(f"SELECT url, cluster_id FROM '{out}/*.parquet'").df()
    got = dict(got_df[["url", "cluster_id"]].values)
    assert got == expected
    assert summary["stages"]["clusters"]["rows"] == len(expected)

    # 5. retention output: exactly one kept member per cluster
    ret = duckdb.sql(
        f"SELECT cluster_id, sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS kept, "
        f"count(*) AS members FROM '{tmp_path}/retention/*.parquet' "
        "GROUP BY cluster_id"
    ).df()
    assert len(ret) > 0
    assert (ret["kept"] == 1).all()
    assert set(got_df["cluster_id"]) == set(ret["cluster_id"])


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
