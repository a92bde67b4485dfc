"""Deterministic sampling: partition-independence, monotone nesting,
stratified rates, disjoint/exhaustive splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.functions.sampling import (
    assign_split,
    hash_sample,
    stratified_sample,
)

N = 20_000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_deterministic_and_partition_independent(spark, docs):
    a = {r.url for r in hash_sample(docs, 0.1).collect()}
    b = {r.url for r in hash_sample(docs.repartition(17), 0.1).collect()}
    c = {r.url for r in hash_sample(docs.coalesce(1), 0.1).collect()}
    assert a == b == c
    # rate lands within binomial noise (4 sigma ~ 0.0085 at n=20k, p=0.1)
    assert abs(len(a) / N - 0.1) < 0.01


def test_monotone_nesting(docs):
    small = {r.url for r in hash_sample(docs, 0.01).collect()}
    big = {r.url for r in hash_sample(docs, 0.1).collect()}
    assert small <= big
    # different salt decorrelates
    other = {r.url for r in hash_sample(docs, 0.1, salt="other").collect()}
    assert other != big


def test_stratified_rates(docs):
    out = stratified_sample(docs, {"en": 0.3, "de": 0.05}, default_rate=0.0)
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    per = N // 3
    assert "fr" not in counts  # default 0
    assert abs(counts["en"] / per - 0.3) < 0.03
    assert abs(counts["de"] / per - 0.05) < 0.02
    # stratum selection reuses the SAME decision variable: the en sample
    # is the plain 0.3 sample restricted to en
    plain = {r.url for r in hash_sample(docs.where("lang = 'en'"), 0.3).collect()}
    assert {r.url for r in out.where("lang = 'en'").collect()} == plain


def test_split_disjoint_exhaustive(docs):
    out = assign_split(docs).groupBy("split").agg(F.count("*").alias("c"))
    counts = {r.split: r.c for r in out.collect()}
    assert set(counts) == {"train", "validation", "test"}
    assert sum(counts.values()) == N
    assert abs(counts["train"] / N - 0.98) < 0.01
    # independent of sampling decisions (different salt)
    sampled = hash_sample(docs, 0.5)
    sp = assign_split(sampled).groupBy("split").count().collect()
    assert {r.split for r in sp} == {"train", "validation", "test"}


def test_bad_args(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1})
    with pytest.raises(ValueError):
        assign_split(docs, {"train": 0.5, "test": 0.4})


def test_budget_sample(spark, docs):
    from video_duplicate_finder_python_spark.functions.sampling import budget_sample

    d = docs.withColumn(
        "n_tokens", (F.xxhash64("url") % 900 + 900) % 900 + 100  # 100..999
    )
    totals = {
        r.lang: r.t for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    out = budget_sample(d, {"en": totals["en"] // 10, "de": totals["de"] * 2})
    got = {
        r.lang: r.t for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert "fr" not in got  # no budget -> dropped
    assert got["de"] == totals["de"]  # budget above total -> whole stratum
    target = totals["en"] // 10
    assert abs(got["en"] / target - 1.0) < 0.15  # binomial noise at ~666 docs
    # deterministic across re-runs
    a = sorted(r.url for r in out.collect())
    b = sorted(
        r.url
        for r in budget_sample(d, {"en": totals["en"] // 10, "de": totals["de"] * 2}).collect()
    )
    assert a == b
