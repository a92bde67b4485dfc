"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``fukaf/video-duplicate-finder-python`` (a per-file
perceptual-hash duplicate scanner, see SURVEY.md): shingle extraction and
batched 128-perm MinHash / 64-bit SimHash signatures via vectorized
pandas/Arrow UDFs, LSH band hashing into groupBy-driven candidate
generation, exact Jaccard / Hamming verification, content-defined-chunk
fingerprints for long verbatim substring duplicates, and iterative
large-star/small-star connected components for cluster assignment —
over a lakehouse table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``.

Reference parity map lives in SURVEY.md §2 (operators O1–O19).
"""

from .config import DedupConfig
from .session import get_spark
from .plans.pipeline import DedupPipeline, PipelineCancelled

__all__ = ["DedupConfig", "get_spark", "DedupPipeline", "PipelineCancelled"]
