"""Page-table sources (SURVEY O1).

The reference's source is a recursive directory walk with an extension
predicate (/root/reference/src/core/scanner.py:65-75); ours is a columnar
table scan — parquet in the sandbox, Iceberg in a real deployment (same
reader seam). Filters passed here become Catalyst pushed predicates at the
scan, the declarative analog of the extension check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(
    spark: SparkSession,
    path: str,
    langs: list[str] | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if langs:
        df = df.filter(F.col("lang").isin(langs))  # pushed to the scan
    return df


def docs_to_pages(docs: DataFrame) -> DataFrame:
    """Adapt a ``documents``-shaped frame (doc_id, text, lang) to the pages
    schema — shared by the driver's table and the derived test corpora
    (exact-copy / substring-twin unions) built on top of it.

    Deterministic: the html wrap matches FIXTURES.md F1 so the extraction
    invariant (extract_text(html) == text, byte-identical) holds here too.
    """
    return docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("doc_id").cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.concat(
            F.lit("<html><head><title>t"),
            F.col("doc_id").cast("string"),
            F.lit("</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's ``documents`` table as pages (see docs_to_pages)."""
    return docs_to_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
