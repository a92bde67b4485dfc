"""Exact-collapse key width + pair expansion through representatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.operators.exact import (
    content_hash_col,
    exact_duplicate_groups,
)
from video_duplicate_finder_python_spark.operators.expand import (
    expand_pairs_through_reps,
)


def test_content_hash_is_128_bit(spark):
    """The collapse key must be 128-bit: at the 10^12-doc target a 64-bit
    key makes birthday collisions *expected* (~n²/2^65), silently fusing
    unrelated docs into one exact group (VERDICT r1 #3; the reference's
    identity is 128-bit md5, hasher.py:76)."""
    df = spark.createDataFrame([("x", "alpha"), ("y", "beta")], ["url", "text"])
    rows = df.select(content_hash_col(F.col("text")).alias("h")).collect()
    assert all(len(r["h"]) == 16 for r in rows)  # 16 bytes = 128 bits
    assert rows[0]["h"] != rows[1]["h"]


def test_narrow_hash_collision_does_not_merge(spark):
    """Two texts whose xxhash64 values collide in the low 32 bits (found by
    birthday search, pinned here) must land in different exact groups —
    i.e. the group key no longer depends on any 64-bit-or-narrower hash."""
    candidates = spark.range(0, 200_000).select(
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text")
    ).withColumn("h32", F.xxhash64("text").bitwiseAND(F.lit(0xFFFFFFFF)))
    dup = (
        candidates.groupBy("h32").agg(
            F.count(F.lit(1)).alias("n"), F.collect_list("text").alias("texts")
        )
        .where((F.col("n") >= 2))
        .limit(1)
        .collect()
    )
    assert dup, "birthday search over 200k texts should yield a 32-bit collision"
    t1, t2 = dup[0]["texts"][:2]
    assert t1 != t2
    docs = spark.createDataFrame([("a", t1), ("b", t2)], ["url", "text"])
    rep_docs, exact_edges = exact_duplicate_groups(docs)
    assert rep_docs.count() == 2
    assert exact_edges.count() == 0


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "url_a string, url_b string, jaccard double, hamming int, "
        "lcs_len int, sources array<string>, is_dup boolean"
    )


def test_expand_pairs_through_reps(spark):
    """rep-level pair (r1, r2) + groups {r1,m1},{r2,m2,m3} expands to all
    member-level cross pairs at the rep pair's score, plus within-group
    pairs at jaccard 1.0 (ADVICE r1: the reference reports file-level
    pairs, database.py:49-60)."""
    pairs = _pairs_df(spark, [("r1", "r2", 0.9, 2, None, ["minhash"], True)])
    exact_edges = spark.createDataFrame(
        [("m1", "r1"), ("m2", "r2"), ("m3", "r2")], ["u", "v"]
    )
    out = expand_pairs_through_reps(pairs, exact_edges)
    got = {(r["url_a"], r["url_b"]): r["jaccard"] for r in out.collect()}
    cross = {("r1", "r2"), ("m1", "r2"), ("m1", "m2"), ("m1", "m3"),
             ("m2", "r1"), ("m3", "r1")}
    within = {("m1", "r1"), ("m2", "m3"), ("m2", "r2"), ("m3", "r2")}
    assert set(got) == cross | within
    assert all(got[p] == 0.9 for p in cross)
    assert all(got[p] == 1.0 for p in within)


def test_expand_pairs_no_groups_is_identity(spark):
    pairs = _pairs_df(spark, [("a", "b", 0.85, 1, None, ["minhash"], True)])
    empty_edges = spark.createDataFrame([], "u string, v string")
    out = expand_pairs_through_reps(pairs, empty_edges)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["url_a"], rows[0]["url_b"], rows[0]["jaccard"]) == ("a", "b", 0.85)
