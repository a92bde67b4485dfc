"""Large-star/small-star CC on the FIXTURES.md F5 hand-built graphs —
each merge branch of the reference union-find
(/root/reference/src/gui/main_window.py:238-255)."""

from __future__ import annotations

from video_duplicate_finder_python_spark.operators.connected_components import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {
        (r["url"], r["cluster_id"]) for r in connected_components(df).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a")}


def test_two_disjoint_pairs(spark):
    got = _cc(spark, [("a", "b"), ("c", "d")])
    assert got == {("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")}


def test_star(spark):
    got = _cc(spark, [("m", "x1"), ("m", "x2"), ("m", "x3")])
    assert got == {("m", "m"), ("x1", "m"), ("x2", "m"), ("x3", "m")}


def test_late_merge_of_two_groups(spark):
    # the reference's "both in different groups" branch: two existing
    # components joined by a late edge
    got = _cc(spark, [("a", "b"), ("x", "y"), ("b", "x")])
    assert got == {("a", "a"), ("b", "a"), ("x", "a"), ("y", "a")}


def test_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {("a", "a"), ("b", "a")}


def test_long_path_converges(spark):
    n = 40
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    got = dict(_cc(spark, edges))
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1
