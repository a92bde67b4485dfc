"""Benchmark decontamination: flag training documents that share n-grams
with an evaluation set.

A training-data pipeline must detect corpus documents that overlap a held-
out benchmark (GPT-3 App. C / PaLM-style n-gram collision check) — related
to dedup but with an asymmetric shape: the eval side is tiny and the
corpus side is the 100 TB table. This is NOT in the reference (whole-item
scanner only); it extends the engine's shingle machinery
(functions/signatures.py) to the contamination use case.

Scale shape: the eval set's distinct shingles are benchmark-sized
(thousands of rows), so the overlap join broadcasts them against the
exploded corpus shingles — one corpus pass, zero corpus-sized shuffle
until the tiny per-doc count aggregate over matching rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contamination_overlap(
    corpus_shingled: DataFrame,
    eval_shingled: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "s",
) -> DataFrame:
    """→ (doc_id, n_shared): corpus docs sharing ≥1 distinct shingle with
    the eval set, with the count of distinct shared shingles.

    Both inputs carry (id_col, shingle_col: array<string>) — the same
    shingle-string shape __spark_entry__._with_shingle_strings builds.
    The eval side is collapsed to distinct shingles and broadcast.
    """
    eval_grams = (
        eval_shingled.select(F.explode(F.col(shingle_col)).alias("gram"))
        .distinct()
    )
    corpus_grams = corpus_shingled.select(
        F.col(id_col).alias("doc_id"), F.explode(F.col(shingle_col)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
    )
