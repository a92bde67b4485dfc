"""SemDeDup — semantic deduplication over an embedding column.

Published analog: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540) — k-means the
embedding space, compare pairs ONLY within a cell, call a pair semantic
duplicates when cosine ≥ 1 - eps, and keep exactly one member per
duplicate group: the one with the LOWEST similarity to its cell centroid
(the paper's keep-the-outlier policy, which preserves diversity).

Spark-first composition — every stage is an operator this engine already
ships, so the new surface is just the glue:

- centroids: ``operators/ann.train_ivf_centroids`` (seeded spherical
  k-means on a bounded driver-side sample — the corpus never trains);
- cell assignment + centroid similarity: one Arrow-batched pandas UDF
  (matrix product per batch, mirroring ``make_ivf_assign_udf``);
- within-cell candidate pairs: ``bucket_join.bucket_pairs`` keyed on
  ``centroid_id`` — the cap + salted ranking bound the quadratic blow-up
  SemDeDup's own design accepts inside a cell (a mega-cell on a 10^12-doc
  corpus is ranked per-salt, capped, and the spill is a counted metric,
  never an OOM);
- exact pair cosine: JVM ``zip_with``/``aggregate`` fold
  (``operators/ann.cosine_col``) — no Python past the assignment stage;
- duplicate groups: the same two-phase connected components as the text
  pipeline, so transitively-linked duplicates collapse to ONE keeper
  (the paper's per-pair dedup can keep two members of a chained triple);
- keep policy: a map-side-combinable ``min_by`` aggregate per cluster —
  the skew-safe shape the retention operator uses (no per-cluster window).

Reference seam: this is the embedding-space twin of the pipeline's
text-signature dedup (SURVEY O5-O8, O10, O16) applied to the
``embeddings`` table the training-pipeline brief ships.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ann import _l2_normalize, cosine_col
from .bucket_join import bucket_pairs
from .connected_components import connected_components

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("centroid_id", T.IntegerType(), False),
        T.StructField("cent_sim", T.DoubleType(), False),
    ]
)


def assign_cells(embeddings: DataFrame, cents: np.ndarray) -> DataFrame:
    """``(vec_id, embedding, ...)`` → ``+ (centroid_id, cent_sim)``.

    One Arrow-batched matrix product per batch (spherical cells: nearest
    centroid == argmax of normalized dot, see train_ivf_centroids)."""
    cents = np.ascontiguousarray(cents, dtype=np.float64)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def assign_udf(emb: pd.Series) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        sims = _l2_normalize(mat) @ cents.T
        cid = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                "centroid_id": cid.astype(np.int32),
                "cent_sim": sims[np.arange(len(cid)), cid],
            }
        )

    return embeddings.withColumn("_a", assign_udf("embedding")).select(
        "*", "_a.centroid_id", "_a.cent_sim"
    ).drop("_a")


def _cell_pair_edges(cells: DataFrame, eps: float):
    """Per-cell all-pairs cosine: ONE BLAS gemm per cell instead of a
    pair-exploded kernel. The pair fan-out ships both embeddings per pair
    (2×64 float64 ≈ 1 KB × pairs — 3 GB through Arrow for 3.1M pairs at
    sf1.0, measured 14.1 s); grouping by cell ships each embedding ONCE
    (10 MB for the same input) and scores the cell with m @ m.T — the
    optimization guide's §8 rule (move heavy bytes once, decide with
    dense math). Only called for cells whose size is within
    ``max_cell_compare``, so the per-task matrix is bounded by
    cap² × 8 B (8 MB at the 1024 default); over-cap cells take the
    capped/salted bucket path instead. Emits exactly the edges the
    pair kernel emits for those cells: every vid_a < vid_b with
    cosine >= 1 - eps (gemm dot order can differ from the per-pair
    kernels in the last ulps — same documented boundary caveat as
    arrow-vs-jvm)."""
    thr = 1.0 - eps

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
        pdf = pdf.sort_values("vid")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        norms[norms == 0.0] = 1.0
        sims = (m @ m.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(pdf), k=1)
        keep = sims[iu[0], iu[1]] >= thr
        vids = pdf["vid"].to_numpy()
        return pd.DataFrame({"u": vids[iu[0][keep]], "v": vids[iu[1][keep]]})

    return cells.select("centroid_id", "vid", "embedding").groupBy(
        "centroid_id"
    ).applyInPandas(per_cell, schema="u string, v string")


def _arrow_cosine_udf():
    """Batched NumPy pair cosine: one einsum per Arrow batch. ~2× the JVM
    fold at dim 64 (measured 9.6 → 4.9 s on 3M pairs at local[4]) and
    memory-bandwidth-friendlier across cores — the remedy for the
    fold-bound scaling the round-6 pairing surfaced
    (BENCH/SEMDEDUP_SCALING_R6.md). Float summation ORDER differs from
    the sequential fold, so scores can differ in the last ulps — pairs
    sitting exactly on the eps boundary may flip vs the jvm kernel."""

    @F.pandas_udf(T.DoubleType())
    def cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.einsum("ij,ij->i", ma, ma)
        nb = np.einsum("ij,ij->i", mb, mb)
        return pd.Series(dots / np.sqrt(na * nb))

    return cos_udf


def semdedup(
    embeddings: DataFrame,
    cents: np.ndarray,
    eps: float = 0.05,
    max_cell_compare: int = 1024,
    salt_threshold: int | None = 65536,
    persist: bool = False,
    pair_kernel: str = "cell",
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """→ ``(members, dropped, cached)``.

    ``members(vec_id, cluster_id, cent_sim, is_kept)`` — one row per
    member of a semantic-duplicate group (vectors in no group are
    implicitly kept, same convention as operators/retention); exactly one
    ``is_kept`` row per cluster: lowest ``cent_sim``, vec_id tiebreak.
    ``dropped`` counts cell members beyond ``max_cell_compare`` (cap
    metric); ``cached`` are caller-owned persisted handles.

    ``pair_kernel``:
    - "cell" (default, late r7): cells within ``max_cell_compare`` are
      scored with ONE BLAS gemm per cell (`_cell_pair_edges` — each
      embedding crosses the boundary once instead of once per pair;
      measured 14.1 s → ~1 s for the 3.1M-pair edge pass at sf1.0);
      over-cap cells keep the exact capped/salted bucket path below,
      scored with the arrow pair kernel, so the skew contract is
      byte-identical where it matters.
    - "arrow" (default earlier in r7 — the r6 scaling pairing measured
      the JVM fold as the operator's bandwidth-bound bottleneck,
      BENCH/SEMDEDUP_SCALING_R6.md): batched einsum over exploded pairs.
    - "jvm": the sequential ``aggregate`` fold — bit-exact against the
      NumPy twin and any left-fold oracle, and the equivalence twin the
      tests pin (last-ulp score differences between all three kernels —
      see _arrow_cosine_udf / _cell_pair_edges).
    """
    if pair_kernel not in ("jvm", "arrow", "cell"):
        raise ValueError(
            f"pair_kernel must be 'jvm', 'arrow' or 'cell', got {pair_kernel!r}"
        )
    assigned = assign_cells(embeddings, cents).select(
        # zero-padded string id: bucket_pairs orders by it and CC min()s
        # it lexicographically — padding makes both match numeric order.
        # Width 20 covers every non-negative int64 (19 digits): Spark's
        # lpad TRUNCATES over-length inputs, so a narrower pad would
        # silently collapse distinct ids at >= 10^12 — the exact scale
        # this module targets. vec_id must be non-negative (a '-' sign
        # breaks the lexicographic==numeric equivalence).
        F.lpad(F.col("vec_id").cast("string"), 20, "0").alias("vid"),
        "embedding",
        "centroid_id",
        "cent_sim",
    ).localCheckpoint(eager=False)
    # the assignment UDF feeds three consumers (bucket sizes pass, the
    # ranking window, the keeper join) — the lazy checkpoint computes it
    # once and truncates its subtree out of every downstream plan (the
    # same plan-diamond rule as the probe, incremental_probe.py docstring)
    cached0: list[DataFrame] = [assigned]

    def bucketed_edges(df: DataFrame, kernel: str):
        cand, dropped, cached = bucket_pairs(
            df,
            key_cols=["centroid_id"],
            id_col="vid",
            carry_cols=["embedding", "cent_sim"],
            max_bucket_size=max_cell_compare,
            persist=persist,
            salt_threshold=salt_threshold,
        )
        if kernel == "arrow":
            cos = _arrow_cosine_udf()(F.col("embedding_a"), F.col("embedding_b"))
        else:
            cos = cosine_col(F.col("embedding_a"), F.col("embedding_b"))
        e = (
            cand.withColumn("cos", cos)
            .where(F.col("cos") >= F.lit(1.0 - eps))
            .select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
        )
        return e, dropped, cached

    if pair_kernel == "cell":
        # route by cell size: within-cap cells take the per-cell gemm (no
        # pair explosion, no cap drops by definition); over-cap cells —
        # the skew class the cap/salt machinery exists for — take the
        # bucket path unchanged. Cell count is bounded by len(cents), so
        # the over-cap key set is a tiny broadcast.
        sizes = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("_n")
        )
        big_keys = sizes.where(F.col("_n") > max_cell_compare).select("centroid_id")
        small = assigned.join(F.broadcast(big_keys), "centroid_id", "left_anti")
        big = assigned.join(F.broadcast(big_keys), "centroid_id", "left_semi")
        big_edges, dropped, cached = bucketed_edges(big, "arrow")
        edges = _cell_pair_edges(small, eps).unionByName(big_edges)
    else:
        edges, dropped, cached = bucketed_edges(assigned, pair_kernel)
    clusters = connected_components(edges)  # (url, cluster_id)

    members = clusters.join(
        assigned.select(F.col("vid").alias("url"), "cent_sim"), "url"
    )
    # skew-safe keeper: map-side-combinable min_by per cluster (no window)
    winners = members.groupBy("cluster_id").agg(
        F.min_by("url", F.struct(F.col("cent_sim"), F.col("url"))).alias("_keep")
    )
    out = (
        members.join(winners, "cluster_id")
        .select(
            F.col("url").cast("bigint").alias("vec_id"),
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "cent_sim",
            (F.col("url") == F.col("_keep")).alias("is_kept"),
        )
    )
    return out, dropped, cached0 + cached
