"""Iterative large-star / small-star connected components (SURVEY O10).

Replaces the reference's sequential, driver-side union-find
(/root/reference/src/gui/main_window.py:224-264) with the alternating
large-star/small-star dataflow of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14) — pure DataFrame joins/aggregations, no
GraphFrames, converging in O(log n) rounds. ``localCheckpoint`` truncates
lineage each round so the plan doesn't grow across iterations.

Node ids are the url strings themselves and the final cluster id is the
lexicographic min url of the component — the deterministic analog of the
reference's first-seen integer group id, and the exact semantics the oracle
(oracle.py) asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    nbr_to_min = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_to_min = joined.select("u", F.col("m").alias("v")).distinct()
    return nbr_to_min.union(self_to_min).where(F.col("u") != F.col("v")).distinct()


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """``edges(u, v)`` (undirected, any orientation) → ``clusters(url, cluster_id)``.

    Only nodes that appear in at least one edge are emitted (singletons have
    no row, matching the reference: files in no duplicate pair join no
    group).
    """
    # lazy localCheckpoint: the digest action right after materializes the
    # round's edges AND truncates lineage in the same job — eager=True
    # spent a second driver-blocking action per round, pure serial latency
    # in the otherwise-parallel loop (round-1 scaling residue)
    e = (
        edges.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    digest = _edge_digest(e)
    converged = False
    for _ in range(max_iter):
        # two large-star/small-star rounds per driver-blocking digest
        # action: each round's lazy localCheckpoint still materializes
        # (and truncates lineage) inside the digest job, but the driver
        # only synchronizes every OTHER round — halving the serial
        # per-round scheduling latency that dominates at high thread
        # counts (and, on a real cluster, per-round driver sync on the
        # critical path). Cost: at most one redundant round after the
        # fixpoint, which on fixpoint stars is a cheap no-op transform.
        mid = _small_star(_large_star(e)).localCheckpoint(eager=False)
        e = _small_star(_large_star(mid)).localCheckpoint(eager=False)
        next_digest = _edge_digest(e)
        if next_digest == digest:
            converged = True
            break
        digest = next_digest
    if not converged:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # fixpoint edges form stars (member -> min); include the roots themselves
    return (
        e.select(F.col("u").alias("url"), F.col("v").alias("cluster_id"))
        .union(e.select(F.col("v").alias("url"), F.col("v").alias("cluster_id")))
        .distinct()
    )
