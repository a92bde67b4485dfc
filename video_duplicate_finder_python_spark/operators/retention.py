"""Cluster retention policy — turn cluster assignments into a kept corpus.

Dedup ends with a decision, not a cluster id: exactly one member of every
duplicate cluster is retained and the rest are dropped. The standard
web-pipeline policy is deterministic "best doc wins" (longest text, then
lexicographic url as the tiebreak).

Skew shape (round-6 rewrite): the obvious expression — a ``row_number``
window over ``cluster_id`` — sorts each cluster in ONE task, and cluster
sizes are NOT capped upstream: exact-duplicate members enter clusters as
linear star edges, so one boilerplate page crawled 10^8 times is one
10^8-member cluster and the window becomes a single-task sort (the exact
skew class the bucket caps defend against elsewhere). Instead the winner
is computed with ``min_by(url, rank_key)`` — a map-side-combinable
aggregate whose partial states are one (url, key) pair per cluster per
partition, so a mega-cluster's rows combine locally and only per-cluster
winners shuffle — and ``is_kept`` is derived by joining the winner back on
``cluster_id``. That join is a hash join against a 1-row-per-cluster build
side: no sort, streaming probe, and AQE's skew-join split handles a
mega-cluster's probe partition. Same output as the window, skew-immune.

Reference parity: the reference GUI keeps the first file of each
duplicate group and marks the rest for deletion
(/root/reference/src/gui/main_window.py — per-group keep/delete
selection); this is that semantic as a deterministic bulk operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_rank_key(id_col: str = "url") -> Column:
    """The default retention ranking: longest text wins, url ascending as
    the tiebreak — expressed as a struct to MINIMIZE (``-n_chars`` makes
    "longest first" a minimization so strings need no order reversal).

    NULL ``n_chars`` (e.g. ``F.length(text)`` of a null-text page) must
    rank LAST, matching the window formulation this aggregate replaced
    (``n_chars.desc()`` is NULLS LAST): in a struct comparison a NULL
    field sorts FIRST ascending, so without the explicit null-flag field
    a cluster containing one unextractable page would retain the empty
    doc and drop the real content."""
    return F.struct(
        F.col("n_chars").isNull().cast("int").alias("nulls_last"),
        (-F.coalesce(F.col("n_chars"), F.lit(0))).alias("neg_n_chars"),
        F.col(id_col).alias("tiebreak"),
    )


def cluster_retention(
    clusters: DataFrame,
    docs: DataFrame,
    rank_key: Column | None = None,
    id_col: str = "url",
) -> DataFrame:
    """``clusters(url, cluster_id)`` × ``docs(url, ...)`` →
    ``(url, cluster_id, is_kept)``: ``is_kept`` is true for exactly one
    member per cluster — the member whose ``rank_key`` is smallest
    (default: longest ``n_chars`` first, then ``url`` ascending; docs must
    carry the ranking columns).

    Join contract: ``clusters`` urls must be a subset of ``docs`` urls —
    the member join is INNER, so a cluster member missing from ``docs`` is
    dropped from the output (and can flip which member is kept). Callers
    joining a filtered doc table should filter ``clusters`` identically
    first. Docs absent from ``clusters`` are singletons and implicitly
    kept; callers that need them listed can union them back with
    ``is_kept = true``.
    """
    rank_key = rank_key if rank_key is not None else default_rank_key(id_col)
    members = clusters.join(docs, id_col).select(
        id_col, "cluster_id", rank_key.alias("_rank_key")
    )
    winners = members.groupBy("cluster_id").agg(
        F.min_by(F.col(id_col), F.col("_rank_key")).alias("_winner")
    )
    return members.join(winners, "cluster_id").select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("_winner")).alias("is_kept"),
    )
