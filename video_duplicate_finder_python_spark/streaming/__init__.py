"""Streaming surface.

The reference is strictly batch (SURVEY.md §2: no streaming, watermarks, or
late-data handling anywhere in it), and the north rule targets batch over
Iceberg snapshots: "late data" is a new snapshot handled by the incremental
anti-join path (operators/incremental.py). A Structured-Streaming ingest
(readStream on the pages source → foreachBatch into the same incremental
refresh) is the natural extension point and lands in a later round.
"""
