"""Bucketed candidate generation: pair emission, singleton skip, skew cap."""

from __future__ import annotations

from video_duplicate_finder_python_spark.operators.bucket_join import bucket_pairs


def _pairs(spark, rows, max_bucket_size=256):
    df = spark.createDataFrame(rows, ["key", "url"])
    pairs, dropped, _cached = bucket_pairs(
        df, key_cols=["key"], max_bucket_size=max_bucket_size
    )
    got = sorted((r["url_a"], r["url_b"]) for r in pairs.collect())
    return got, int(dropped.first()[0] or 0)


def test_pairs_within_bucket(spark):
    got, dropped = _pairs(
        spark, [(1, "a"), (1, "b"), (1, "c"), (2, "x"), (2, "y"), (3, "solo")]
    )
    assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")]
    assert dropped == 0


def test_singleton_buckets_skipped(spark):
    got, _ = _pairs(spark, [(i, f"u{i}") for i in range(10)])
    assert got == []


def test_orientation_invariant(spark):
    got, _ = _pairs(spark, [(1, "zz"), (1, "aa")])
    assert got == [("aa", "zz")]


def test_skew_cap_drops_and_counts(spark):
    rows = [(1, f"u{i:03d}") for i in range(10)]
    got, dropped = _pairs(spark, rows, max_bucket_size=4)
    # capped at 4 members -> C(4,2)=6 pairs, 6 members dropped (counted)
    assert len(got) == 6
    assert dropped == 6
