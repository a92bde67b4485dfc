from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from video_duplicate_finder_python_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vdf-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from video_duplicate_finder_python_spark.corpus import generate_corpus

    return generate_corpus(seed=42, n_docs=240)


@pytest.fixture(scope="session")
def oracle_result(corpus):
    from video_duplicate_finder_python_spark.oracle import run_oracle

    return run_oracle(corpus.pages, corpus.truth_pairs)


@pytest.fixture(scope="session")
def pipeline_result(spark, corpus):
    from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline
    from video_duplicate_finder_python_spark.corpus import pages_spark_df

    pages = pages_spark_df(spark, corpus)
    return DedupPipeline(spark, DedupConfig()).run(pages)
