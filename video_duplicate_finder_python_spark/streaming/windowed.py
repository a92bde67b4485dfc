"""Watermarked windowed aggregation over the page stream.

The monitoring surface of a continuous ingest: per crawl-time window and
language, how many pages and bytes landed. ``warc_ts`` is event time (the
crawl timestamp, not arrival time), so WARC drops that land hours late
still count into their own window — up to the watermark, after which the
window is finalized, emitted once (append mode), and later stragglers are
dropped. That bounds the windowed state exactly as the north rule's
lakehouse deployment needs: state = open windows only, never the stream's
history.

Pure built-in operators (withWatermark → window → agg): Catalyst handles
the state store, late-row filtering, and window eviction; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_crawl_stats(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """``pages_stream(url, warc_ts, html, lang, ...)`` (streaming) →
    ``(window_start, window_end, lang, n_pages, bytes_in)``, one row per
    finalized (window, lang) in append mode."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "bytes_in",
        )
    )
