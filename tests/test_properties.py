"""Property tests (SURVEY.md §5.5): threshold monotonicity and
row-order/permutation invariance of cluster assignment."""

from __future__ import annotations

import pytest

from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline
from video_duplicate_finder_python_spark.corpus import generate_corpus, pages_spark_df


@pytest.fixture(scope="module")
def small_corpus():
    return generate_corpus(seed=13, n_docs=100)


def _dup_pairs(spark, corpus, threshold):
    pages = pages_spark_df(spark, corpus)
    res = DedupPipeline(spark, DedupConfig(jaccard_threshold=threshold)).run(pages)
    verified = {
        (r["url_a"], r["url_b"])
        for r in res.pairs.where("is_dup").collect()
    }
    exact = {tuple(sorted((r["u"], r["v"]))) for r in res.exact_edges.collect()}
    return verified | exact


def test_threshold_monotonicity(spark, small_corpus):
    """Pairs found at a higher threshold must be a subset of those at a
    lower one (same candidates, stricter predicate)."""
    high = _dup_pairs(spark, small_corpus, 0.9)
    low = _dup_pairs(spark, small_corpus, 0.7)
    assert high <= low


def test_row_order_invariance(spark, small_corpus):
    pages = pages_spark_df(spark, small_corpus, partitions=4)
    shuffled = pages.orderBy("text").repartition(7)
    res_a = DedupPipeline(spark, DedupConfig()).run(pages)
    res_b = DedupPipeline(spark, DedupConfig()).run(shuffled)
    a = sorted(map(tuple, res_a.clusters.collect()))
    b = sorted(map(tuple, res_b.clusters.collect()))
    assert a == b
