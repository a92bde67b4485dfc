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
    grams_distinct: bool = False,
) -> DataFrame:
    """→ (doc_id, n_shared): corpus docs sharing ≥1 distinct shingle with
    the eval set, with the count of distinct shared shingles.

    Both inputs carry (id_col, shingle_col: array<string>) — the same
    shingle-string shape __spark_entry__._with_shingle_strings builds.
    The eval side is collapsed to distinct shingles and broadcast.

    ``grams_distinct=True`` is the caller's assertion that each corpus
    doc's shingle array is already duplicate-free (true for
    `_with_shingle_strings`, which applies array_distinct) — the per-doc
    aggregate then skips the count-distinct machinery for a plain count
    over the (doc, gram)-unique joined rows: identical result, one fewer
    dedup pass (r7 optimization, measured ~0.4 s at sf0.1 and verified
    row-identical)."""
    eval_grams = (
        eval_shingled.select(F.explode(F.col(shingle_col)).alias("gram"))
        .distinct()
    )
    corpus_grams = corpus_shingled.select(
        F.col(id_col).alias("doc_id"), F.explode(F.col(shingle_col)).alias("gram")
    )
    agg = (
        F.count(F.lit(1)) if grams_distinct else F.count_distinct("gram")
    ).alias("n_shared")
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(agg)
    )
