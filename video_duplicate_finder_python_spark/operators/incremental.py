"""Incremental signature refresh — the cache probe as an anti-join (SURVEY O3/O15).

The reference skips hashing when a file's path is cached AND its
size+mtime are unchanged, deleting stale rows first
(/root/reference/src/core/database.py:93-130, scanner.py:88-103). The
distributed equivalent is two set operations against the signature
checkpoint keyed on ``(url, content_hash)``:

- rows whose (url, content_hash) still exist in the new snapshot stay
  (cache hit);
- cached rows whose url vanished or whose content changed are dropped
  (the reference's ``_remove_file`` staleness delete + the
  ``cleanup_missing_files`` GC, database.py:286-313);
- only the anti-join remainder (new or changed docs) pays for signature
  computation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def incremental_signatures(
    docs_hashed: DataFrame,
    old_signatures: DataFrame,
    compute: Callable[[DataFrame], DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """``docs_hashed(url, content_hash, ...)`` + previous checkpoint →
    ``(signatures, delta_docs)``; ``compute`` runs only on the delta."""
    keys = ["url", "content_hash"]
    still_valid = old_signatures.join(docs_hashed.select(*keys), keys, "left_semi")
    delta = docs_hashed.join(old_signatures.select(*keys), keys, "left_anti")
    fresh = compute(delta)
    return still_valid.unionByName(fresh), delta
