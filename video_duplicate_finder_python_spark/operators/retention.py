"""Cluster retention policy — turn cluster assignments into a kept corpus.

Dedup ends with a decision, not a cluster id: exactly one member of every
duplicate cluster is retained and the rest are dropped. The standard
web-pipeline policy is deterministic "best doc wins" (longest text, then
lexicographic url as the tiebreak), which this operator expresses as a
row_number window over the cluster id — one shuffle on cluster_id, no
UDF, and the window partitions are duplicate clusters (small by
construction; a pathological mega-cluster is already capped upstream by
the bucket caps and exact-collapse star edges).

Reference parity: the reference GUI keeps the first file of each
duplicate group and marks the rest for deletion
(/root/reference/src/gui/main_window.py — per-group keep/delete
selection); this is that semantic as a deterministic bulk operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cluster_retention(
    clusters: DataFrame,
    docs: DataFrame,
    order_by: list[Column] | None = None,
    id_col: str = "url",
) -> DataFrame:
    """``clusters(url, cluster_id)`` × ``docs(url, ...)`` →
    ``(url, cluster_id, is_kept)``: ``is_kept`` is true for exactly one
    member per cluster, chosen by ``order_by`` (default: longest
    ``n_chars`` first, then ``url`` ascending — docs must carry the
    ordering columns). Docs absent from ``clusters`` are singletons and
    implicitly kept; callers that need them listed can union them back
    with ``is_kept = true``."""
    order_by = order_by or [F.col("n_chars").desc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order_by)
    return (
        clusters.join(docs, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .select(
            id_col,
            "cluster_id",
            (F.col("_rn") == 1).alias("is_kept"),
        )
    )
