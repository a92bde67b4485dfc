"""End-to-end corpus-cleaning job (jobs/clean_corpus.py): runs the full
URL-dedup → quality → fuzzy-dedup+retention → line-dedup → PII chain in a
subprocess (the job owns its SparkSession and stops it) and checks the
stage accounting + output invariants."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]


def test_clean_corpus_end_to_end(tmp_path):
    from video_duplicate_finder_python_spark.corpus import generate_corpus

    corpus = generate_corpus(seed=42, n_docs=120)
    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(
        pa.Table.from_pandas(corpus.pages),
        str(inp / "pages.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    out = tmp_path / "clean"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[4] --conf spark.sql.shuffle.partitions=8 pyspark-shell"
    )
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "clean_corpus.py"),
            "--input",
            str(inp),
            "--output",
            str(out),
            # the seeded corpus's synthetic vocabulary has no English
            # stopwords; the job's --quality-rules knob exists exactly for
            # corpora where the English stopword rule would drop everything
            "--quality-rules",
            "too_short,too_long,bad_word_len,repetitive",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("VDF_CLEAN_SUMMARY ")
    )
    summary = json.loads(line.split(" ", 1)[1])
    stages = summary["stages"]

    # stage accounting: monotone non-increasing doc counts, in order
    order = ["read", "url_dedup", "quality", "fuzzy_dedup", "line_dedup"]
    assert list(stages) == order
    assert stages["read"]["docs_out"] == 120
    counts = [stages[s]["docs_out"] for s in order]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # the seeded corpus plants duplicate clusters — fuzzy must remove docs
    assert stages["fuzzy_dedup"]["docs_out"] < stages["quality"]["docs_out"]
    assert stages["fuzzy_dedup"]["clusters"] > 0
    # per-rule quality accounting is present (values corpus-dependent)
    assert set(stages["quality"]["rule_drops"]) == {
        "too_short",
        "too_long",
        "bad_word_len",
        "repetitive",
    }

    # output invariants
    table = pq.read_table(str(out))
    assert {"url", "warc_ts", "lang", "text"} <= set(table.column_names)
    assert table.num_rows == stages["line_dedup"]["docs_out"]
    texts = [t for t in table.column("text").to_pylist() if t]
    # one survivor per duplicate cluster -> no two identical non-empty docs
    assert len(texts) == len(set(texts))
